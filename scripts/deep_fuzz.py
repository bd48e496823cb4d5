"""Out-of-band deep lifecycle fuzz: runs tests/test_lifecycle_fuzz.py's
seeded random walk for MANY seeds (and an env-tunable step count) outside
pytest, as a bug hunt on the committed engine. Any failing seed reproduces
exactly by running the same walk with the same seed.

Usage:
    python scripts/deep_fuzz.py [first_seed] [n_seeds]
    FUZZ_STEPS=30 python scripts/deep_fuzz.py 100 20
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main() -> int:
    first = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    steps = int(os.environ.get("FUZZ_STEPS", "14"))

    import test_lifecycle_fuzz as fz
    from embulk_output_s3_parquet_spark.session import get_spark

    # the walk's step count is a literal in the test; monkey-patch via a
    # wrapper that re-seeds range() through the module if requested
    if steps != 14:
        src = Path(fz.__file__).read_text()
        src = src.replace("for step in range(14):", f"for step in range({steps}):")
        ns: dict = {"__name__": "fz_patched", "__file__": fz.__file__}
        exec(compile(src, fz.__file__, "exec"), ns)
        walk = ns["test_lifecycle_random_walk"]
    else:
        walk = fz.test_lifecycle_random_walk

    spark = get_spark(app="deep-fuzz", cores=8, chunk_rows=4096)
    failures = []
    for seed in range(first, first + n):
        t0 = time.time()
        with tempfile.TemporaryDirectory(prefix=f"fuzz{seed}-") as td:
            try:
                walk(spark, Path(td), seed)
                print(f"seed {seed}: OK ({time.time() - t0:.1f}s)", flush=True)
            except Exception:
                failures.append(seed)
                print(f"seed {seed}: FAIL", flush=True)
                traceback.print_exc()
    print(f"\n{n - len(failures)}/{n} seeds passed; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
