"""Deterministic synthetic source-code corpus (FIXTURES.md F1-F4).

The engine's input table per BASELINE.json input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``
with Zipf-skewed repo/lang hot keys (exercises salting) and source-like
content (gives dict/FSST/RLE traction).

Generation is distributed and order-independent: every cell is a pure
function of the row id (splitmix64 streams), produced in Arrow batches via
``mapInPandas`` over ``spark.range`` -- so the same (seed, rows) yields the
same table at any partitioning, which the checkpoint/resume tests rely on.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

LANGS = [
    "python", "java", "javascript", "c", "cpp", "go", "rust", "ruby",
    "scala", "shell", "markdown", "yaml", "json", "html", "css", "sql",
]
_EXT = {
    "python": "py", "java": "java", "javascript": "js", "c": "c", "cpp": "cc",
    "go": "go", "rust": "rs", "ruby": "rb", "scala": "scala", "shell": "sh",
    "markdown": "md", "yaml": "yml", "json": "json", "html": "html",
    "css": "css", "sql": "sql",
}
_DIRWORDS = [
    "src", "lib", "core", "util", "internal", "api", "server", "client",
    "test", "pkg", "cmd", "common", "engine", "codec", "plan", "io",
]

_KW = {
    "python": ["import os", "import sys", "def main():", "    return None",
               "class Engine:", "    def encode(self, chunk):", "        pass",
               "from typing import Any", "if __name__ == '__main__':", "    main()"],
    "java": ["import java.util.List;", "public class Main {", "    private final int size;",
             "    public void run() {", "        System.out.println(value);", "    }", "}"],
    "go": ["package main", "import \"fmt\"", "func main() {", "\tfmt.Println(total)",
           "}", "var count int64", "if err != nil {", "\treturn err", "}"],
    "rust": ["use std::collections::HashMap;", "fn main() {", "    let mut total = 0u64;",
             "    for i in 0..n {", "        total += data[i];", "    }", "}"],
}
_GENERIC = ["// TODO: refactor", "/* copyright 2024 */", "    value += 1;",
            "    buffer.push(item);", "for (int i = 0; i < n; i++) {", "}",
            "  - name: step", "    run: make test", "SELECT id, name FROM t;",
            "<div class=\"row\">", "données = Übersetzung('日本語')"]

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain PRNG finalizer)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _M
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, stream: int) -> np.ndarray:
    h = _splitmix64(ids.astype(np.uint64) * np.uint64(0x100000001B3) + np.uint64(SEED * 1315423911 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


def _lang_lines(lang: str) -> list[str]:
    return _KW.get(lang, []) + _GENERIC


def gen_batch(ids: np.ndarray, n_repos: int) -> pd.DataFrame:
    repo_cdf = _zipf_cdf(n_repos, 1.2)
    lang_cdf = _zipf_cdf(len(LANGS), 1.2)
    r = np.searchsorted(repo_cdf, _u01(ids, 1))
    li = np.searchsorted(lang_cdf, _u01(ids, 2))
    lang_null = _u01(ids, 3) < 0.005
    content_null = _u01(ids, 4) < 0.001
    content_empty = _u01(ids, 5) < 0.01
    # lognormal length via inverse-normal approximation of u01
    z = np.clip(np.sqrt(2) * _erfinv(2 * _u01(ids, 6) - 1), -4, 4)
    lengths = np.clip(np.exp(7.5 + 1.2 * z), 10, 200_000).astype(np.int64)

    repos, paths, commits, langs, contents = [], [], [], [], []
    for k, i in enumerate(ids):
        ri = int(r[k])
        repo = f"org{ri % 97}/repo{ri}"
        lang = LANGS[int(li[k])]
        rng = np.random.default_rng(np.uint64(_splitmix64(np.array([i], np.uint64))[0]))
        depth = 1 + int(rng.integers(0, 6))
        parts = [_DIRWORDS[int(rng.integers(0, len(_DIRWORDS)))] for _ in range(depth)]
        path = "/".join(parts) + f"/file_{int(i)}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{SEED}:{repo}:{int(i)}".encode()).hexdigest()
        if content_null[k]:
            content = None
        elif content_empty[k]:
            content = ""
        else:
            pool = _lang_lines(lang)
            target = int(lengths[k])
            # repeated import/header block then body lines: runs + repetition
            head = "\n".join(pool[: min(4, len(pool))]) + "\n"
            picks = rng.integers(0, len(pool), max(4, target // 24))
            body = "\n".join(pool[p] for p in picks)
            content = (head + body)[:target]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(None if lang_null[k] else lang)
        contents.append(content)
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def _erfinv(y: np.ndarray) -> np.ndarray:
    """Winitzki approximation of erfinv -- plenty for synthetic lengths."""
    a = 0.147
    y = np.clip(y, -0.999999, 0.999999)
    ln1my2 = np.log(1 - y * y)
    t1 = 2 / (np.pi * a) + ln1my2 / 2
    return np.sign(y) * np.sqrt(np.sqrt(t1 * t1 - ln1my2 / a) - t1)


def repos_df(spark, rows: int, partitions: int | None = None):
    """Distributed deterministic corpus DataFrame (F1)."""
    n_repos = max(4, rows // 200)
    parts = partitions or max(4, min(64, rows // 2000))

    def gen(it):
        for pdf in it:
            yield gen_batch(pdf["id"].to_numpy(), n_repos)

    rng_df = spark.range(0, rows, 1, parts)
    return rng_df.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )


def six_types_df(spark):
    """F2: the reference's 5 golden rows
    (reference TestS3ParquetOutputPlugin.scala:15-32)."""
    import datetime as dt

    tz = dt.timezone(dt.timedelta(hours=9))
    rows = [
        (True, 0, 0.0, "c212c89f91", dt.datetime(2017, 10, 22, 19, 53, 31, tzinfo=tz), '{"a":0,"b":"00"}'),
        (False, 1, -0.5, "aaaaa", dt.datetime(2017, 10, 22, 19, 53, 31, tzinfo=tz), '{"a":1,"b":"11"}'),
        (False, 2, 1.5, "90823c6a1f", dt.datetime(2017, 10, 23, 23, 42, 43, tzinfo=tz), '{"a":2,"b":"22"}'),
        (True, 3, 0.44, "", dt.datetime(2017, 10, 22, 6, 12, 13, tzinfo=tz), '{"a":3,"b":"33"}'),
        (False, 9999, 10000.33333, "e56a40571c", dt.datetime(2017, 10, 23, 4, 59, 16, tzinfo=tz), '{"a":4,"b":"44","c":4.4,"d":true}'),
    ]
    return spark.createDataFrame(
        rows, "c0 boolean, c1 long, c2 double, c3 string, c4 timestamp, c5 string"
    )
