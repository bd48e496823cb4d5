"""HyperLogLog sketches for approximate NDV (ANALYZE-grade distinct
counts) over encoded tables.

One sketch per column per encode call ("phl", riding the first chunk's
meta like the part-level bloom "pbf"), merged register-wise into the
part's lineage row at commit ("hl" in the zone summary). Sketches are
MERGEABLE -- register-wise max -- so a table-wide NDV over 10^6 parts is
one driver-side manifest pass (jobs.distinct_job): the error stays that
of a single sketch (~1.04/sqrt(m)), it does not accumulate with part
count, and appends / DML rewrites / compaction keep sketches current
because every rewrite re-encodes through the same kernel.

Hashing reuses the bloom filters' canonical value serialization
(codecs/bloom._canonical_column: the same bytes for an int64 and the
string of its decimal form never collide with a real string because the
column type is fixed) with blake2b-8 digests, so the two sketch families
cannot disagree about value identity. Register layout: p index bits from
the hash top, rank = leading zeros of the remainder + 1, capped by a
guard bit (standard HLL with linear-counting small-range correction; no
large-range correction is needed at 64-bit hash width)."""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pyarrow as pa

from .bloom import _canonical_column, supported_type

# 2^10 registers: +-3.2% standard error, 1 KB raw (~1.4 KB as b64 in the
# lineage row) per opted-in column per part -- bloom-budget territory.
P_DEFAULT = 10


def _bit_length_u32(u32: np.ndarray) -> np.ndarray:
    """Exact bit_length of uint32 values via frexp (float64 holds 32-bit
    ints exactly; no log2 rounding hazard). 0 for input 0."""
    _, e = np.frexp(u32.astype(np.float64))
    return e


def _rank(h: np.ndarray, p: int) -> np.ndarray:
    """HLL rank: leading zeros of (h << p) + 1, guard-capped at 64-p+1."""
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    hi = (rest >> np.uint64(32)).astype(np.uint32)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl = np.where(hi > 0, _bit_length_u32(hi) + 32, _bit_length_u32(lo))
    return (65 - bl).astype(np.uint8)  # clz + 1


def build(values: pa.Array, p: int = P_DEFAULT) -> dict | None:
    """Sketch the (null-free) chunk/call values -> {"p": p, "r": b64} or
    None for empty/unsupported columns. Hashes only the DISTINCT values
    (HLL of a multiset equals HLL of its support), batched like the bloom
    builder."""
    import pyarrow.compute as pc

    if len(values) == 0 or not supported_type(values.type):
        return None
    uniq = pc.unique(values)
    datas = [d for d in _canonical_column(uniq) if d is not None]
    if not datas:
        return None
    dig = b"".join(hashlib.blake2b(d, digest_size=8).digest() for d in datas)
    h = np.frombuffer(dig, dtype="<u8")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    np.maximum.at(regs, idx, _rank(h, p))
    return {"p": p, "r": base64.b64encode(regs.tobytes()).decode("ascii")}


def merge(sketches: list[dict | None]) -> dict | None:
    """Register-wise max of same-precision sketches; None (any gap or a
    precision mismatch) poisons -- a part/table sketch must cover EVERY
    value or not exist, the same contract as part zones and blooms."""
    if not sketches or any(s is None for s in sketches):
        return None
    p = sketches[0]["p"]
    if any(s["p"] != p for s in sketches):
        return None
    acc = np.frombuffer(base64.b64decode(sketches[0]["r"]), dtype=np.uint8).copy()
    for s in sketches[1:]:
        np.maximum(
            acc,
            np.frombuffer(base64.b64decode(s["r"]), dtype=np.uint8),
            out=acc,
        )
    return {"p": p, "r": base64.b64encode(acc.tobytes()).decode("ascii")}


def estimate(sketch: dict) -> float:
    """Standard HLL estimator with the linear-counting small-range
    correction (Flajolet et al. 2007)."""
    regs = np.frombuffer(base64.b64decode(sketch["r"]), dtype=np.uint8)
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)  # asymptotic constant, m >= 128
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def std_error(sketch: dict) -> float:
    """Relative standard error of the sketch's precision (~1.04/sqrt(m))."""
    m = 1 << sketch["p"]
    return 1.04 / (m ** 0.5)
