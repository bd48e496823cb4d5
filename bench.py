"""Per-round benchmark harness (driver contract).

Runs the headline engine paths at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., ...extra}

Headline paths:
  encode_documents / decode_documents -- the engine core on real text
  encode_corpus                       -- engine on the synthetic source-code
                                         corpus (cached parquet, gen excluded)
  parquet_snappy_baseline             -- the reference-equivalent writer
                                         (BASELINE.md): time + bytes to beat
  q1/q3/dedup/ann                     -- relational + pipeline operators

Extra keys report compression ratio vs the snappy baseline and encode
throughput; scaling across core counts is measured by scripts/scaling_bench.py
(results recorded in BENCH/BASELINE.md).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time


def _dir_size(path: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(p)
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    corpus_rows = int(os.environ.get("BENCH_CORPUS_ROWS", "100000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from embulk_output_s3_parquet_spark.corpus import repos_df
    from embulk_output_s3_parquet_spark.operators.decode import decode_chunks
    from embulk_output_s3_parquet_spark.operators.encode import encode_direct, encode_map
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
    from embulk_output_s3_parquet_spark.session import get_spark

    spark = get_spark(app="bench", cores=cores)
    timings: dict[str, float] = {}
    extra: dict = {"cores": cores}

    # untimed warmup: spawn + import-warm the Python UDF workers on every
    # core (steady-state throughput is the scale-relevant number; cold
    # worker fork+import costs ~5-8s once per executor, reported separately)
    t0 = time.time()
    import pyarrow as pa

    def _noop(batches):
        for b in batches:
            yield pa.RecordBatch.from_pydict({"n": pa.array([b.num_rows], pa.int32())})

    spark.range(0, cores * 2, 1, cores * 2).mapInArrow(_noop, "n int").count()
    extra["worker_warmup_sec"] = round(time.time() - t0, 3)

    def timed(name: str, fn, repeats: int = 1):
        best, out = None, None
        for _ in range(repeats):
            os.sync()  # drain writeback: a query pays ITS OWN IO, not the
            # previous phase's dirty pages (measured: the snappy-writer
            # baseline swings 0.45s..4.2s purely with inherited writeback)
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    policy = CodecPolicy(chunk_rows=32768)

    # --- engine core on documents ------------------------------------------
    # timed encode is UNcached (a cached plan would make repeat 2 measure
    # the cache read); a separate cached copy feeds the decode timing
    def run_encode_docs():
        return encode_map(docs, policy).agg(
            F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
        ).first()

    stats = timed("encode_documents", run_encode_docs, repeats=2)
    enc_docs = encode_map(docs.withColumn("__b", F.lit(1)).drop("__b"), policy).cache()
    enc_docs.count()
    extra["documents_raw_bytes"] = int(stats["raw"])
    extra["documents_enc_bytes"] = int(stats["enc"])

    timed(
        "decode_documents",
        lambda: decode_chunks(enc_docs, docs.schema).count(),
        repeats=2,
    )

    # --- engine on the synthetic source-code corpus -------------------------
    corpus_path = f"/tmp/bench_corpus_{corpus_rows}.parquet"
    if not os.path.exists(corpus_path):
        repos_df(spark, corpus_rows, partitions=cores * 2).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    def run_encode_corpus():
        # the production file-input path: executors scan the parquet corpus
        # with pyarrow directly (no JVM->Python raw-byte double hop) and run
        # the chunk kernels in the same task. parallelism=cores//2: fatter
        # tasks amortize the fixed per-task python-runner handshake that
        # dominates at this input size (see encode_corpus_arrowipc for the
        # DataFrame-input path, which pays the Arrow IPC hop).
        return encode_direct(
            spark, corpus_path, policy, parallelism=max(cores // 2, 1)
        ).agg(
            F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
        ).first()

    cstats = timed("encode_corpus", run_encode_corpus, repeats=2)

    def run_encode_corpus_ipc():
        return encode_map(corpus, policy).agg(
            F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
        ).first()

    # diagnostic, reported under extra (not a headline query): the
    # DataFrame-input encode pays the JVM->Python Arrow IPC hop for every
    # raw byte; the gap vs encode_corpus is that hop's cost
    t0 = time.time()
    run_encode_corpus_ipc()
    extra["encode_corpus_arrowipc_sec"] = round(time.time() - t0, 3)
    # decode_corpus: the production path -- shuffle-free part-aligned scan of
    # a committed table (decode_table_scan); table build is untimed + reused.
    # The cache key includes the policy knobs and engine version so a table
    # built by older code / different chunk sizing is never silently reused.
    import hashlib

    import embulk_output_s3_parquet_spark as engine
    from embulk_output_s3_parquet_spark.jobs import decode_job, encode_job

    pol_key = hashlib.sha256(
        f"{engine.__version__}|{policy.chunk_rows}|{policy.chunk_bytes}"
        f"|{policy.target_partition_bytes}|{policy.default}".encode()
    ).hexdigest()[:10]
    enc_table = f"/tmp/bench_enc_table_{corpus_rows}_{pol_key}"
    if not os.path.exists(os.path.join(enc_table, "manifest.json")):
        shutil.rmtree(enc_table, ignore_errors=True)
        encode_job(spark, corpus, enc_table, policy, if_exists="delete")
    timed("decode_corpus", lambda: decode_job(spark, enc_table).count(), repeats=2)
    extra["corpus_decode_gbps"] = round(
        cstats["raw"] / timings["decode_corpus"] / 1e9, 4
    )

    # approximate NDV (r5): the per-part HLL sidecar merge is a Spark-free
    # driver metadata pass -- reported in extra against the countDistinct
    # scan it replaces (at 100 TB the scan reads the table; this doesn't)
    from embulk_output_s3_parquet_spark.jobs import distinct_job

    ndv_table = f"/tmp/bench_ndv_docs_{pol_key}"
    if not os.path.exists(os.path.join(ndv_table, "manifest.json")):
        shutil.rmtree(ndv_table, ignore_errors=True)
        encode_job(
            spark,
            docs,
            ndv_table,
            CodecPolicy(chunk_rows=32768, ndv_columns=("doc_id", "lang")),
            if_exists="delete",
        )
    t0 = time.time()
    ndv_rep = distinct_job(ndv_table, ["doc_id", "lang"])
    extra["ndv_metadata_sec"] = round(time.time() - t0, 4)
    t0 = time.time()
    exact_ndv = docs.agg(
        F.countDistinct("doc_id").alias("d"), F.countDistinct("lang").alias("l")
    ).first()
    extra["ndv_scan_sec"] = round(time.time() - t0, 3)
    extra["ndv_doc_id_est"] = int(ndv_rep["doc_id"]["ndv"])
    extra["ndv_doc_id_exact"] = int(exact_ndv["d"])

    # export_corpus: the production EXPORT path (jobs.export_job) -- tasks
    # decode with pyarrow and write snappy parquet straight to disk, no
    # JVM<->Python hop for payload bytes; includes the full output write,
    # so compare against parquet_snappy_baseline (same bytes written), not
    # decode_corpus (count only)
    from embulk_output_s3_parquet_spark.jobs import export_job

    export_dir = "/tmp/bench_export_corpus"

    def run_export():
        shutil.rmtree(export_dir, ignore_errors=True)
        return export_job(spark, enc_table, export_dir)

    timed("export_corpus", run_export, repeats=2)
    extra["corpus_export_gbps"] = round(
        cstats["raw"] / timings["export_corpus"] / 1e9, 4
    )
    extra["corpus_rows"] = corpus_rows
    extra["corpus_raw_bytes"] = int(cstats["raw"])
    extra["corpus_enc_bytes"] = int(cstats["enc"])
    extra["corpus_encode_gbps"] = round(
        cstats["raw"] / timings["encode_corpus"] / 1e9, 4
    )

    # --- reference-equivalent baseline (BASELINE.md) -------------------------
    snappy_dir = "/tmp/bench_snappy_corpus"
    shutil.rmtree(snappy_dir, ignore_errors=True)
    def write_snappy():
        shutil.rmtree(snappy_dir, ignore_errors=True)
        corpus.write.option("compression", "snappy").parquet(snappy_dir)

    timed("parquet_snappy_baseline", write_snappy, repeats=2)
    extra["corpus_snappy_bytes"] = _dir_size(snappy_dir)
    extra["ratio_vs_snappy"] = round(
        extra["corpus_enc_bytes"] / max(extra["corpus_snappy_bytes"], 1), 4
    )

    # --- relational + pipeline operators ------------------------------------
    qs = entrymod.queries()
    for name in (
        "rt_lineitem",
        "q1_pricing_summary",
        "q3_top_revenue",
        "dedup_exact_sha",
        "minhash_lsh_candidates",
        "ann_cosine_topk",
        "doc_char_stats",
    ):
        # best-of-2: first execution pays codegen/JIT; steady-state is the
        # scale-relevant number and run-to-run variance was 2-3x otherwise
        timed(name, lambda n=name: qs[n](spark, sf_dir).count(), repeats=2)

    # --- bucketed storage-partitioned join vs the Catalyst join -------------
    # recorded in extra (not timings) so headline_total_sec stays comparable
    # across rounds; the win being measured is "no shuffle of table data"
    from embulk_output_s3_parquet_spark.jobs import decode_job, encode_job
    from embulk_output_s3_parquet_spark.operators.bucketjoin import bucketed_join

    bj_root = f"/tmp/bench_bucketed_{sf}"
    li_path, od_path = f"{bj_root}/lineitem", f"{bj_root}/orders"
    if not os.path.exists(li_path):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        )
        t0 = time.time()
        encode_job(spark, li, li_path, policy, bucket_by=("l_orderkey", 16))
        encode_job(spark, od, od_path, policy, bucket_by=("o_orderkey", 16))
        extra["bucketed_encode_setup_sec"] = round(time.time() - t0, 3)

    def run_bucketed():
        return bucketed_join(spark, li_path, od_path, how="inner").count()

    def run_catalyst():
        l, r = decode_job(spark, li_path), decode_job(spark, od_path)
        return l.join(r, l["l_orderkey"] == r["o_orderkey"], "inner").count()

    best_b = best_c = None
    for _ in range(2):
        t0 = time.time()
        nb = run_bucketed()
        dt = time.time() - t0
        best_b = dt if best_b is None else min(best_b, dt)
        t0 = time.time()
        nc = run_catalyst()
        dt = time.time() - t0
        best_c = dt if best_c is None else min(best_c, dt)
    assert nb == nc, (nb, nc)
    extra["bucketed_join_sec"] = round(best_b, 3)
    extra["catalyst_join_sec"] = round(best_c, 3)
    extra["bucketed_join_rows"] = int(nb)

    # --- merge-on-read vs copy-on-write trickle delete (r5) -----------------
    # the 100 TB DML claim as recorded numbers: a random-key trickle delete
    # (sha1 commit prefix, ~1/256 of rows) admits every part because the
    # commit column is unclustered, so copy-on-write pays O(admitted parts)
    # 64 MB-class rewrites while merge-on-read pays O(matched rows) bitmap
    # sidecars. Hard-link clone of the committed bench table: the engine
    # never mutates a file in place (atomic os.replace mints new inodes),
    # so the source table's bytes are untouchable through the clone.
    from embulk_output_s3_parquet_spark.jobs import delete_job

    dml_table = f"/tmp/bench_dml_{corpus_rows}_{pol_key}"
    shutil.rmtree(dml_table, ignore_errors=True)
    shutil.copytree(enc_table, dml_table, copy_function=os.link)
    os.sync()
    t0 = time.time()
    rep_m = delete_job(
        spark, dml_table, ("commit", "startswith", "00"), mode="mor"
    )
    extra["mor_delete_sec"] = round(time.time() - t0, 3)
    os.sync()
    t0 = time.time()
    rep_c = delete_job(spark, dml_table, ("commit", "startswith", "01"))
    extra["cow_delete_sec"] = round(time.time() - t0, 3)
    extra["mor_delete_rows"] = int(rep_m["rows_deleted"])
    extra["cow_delete_rows"] = int(rep_c["rows_deleted"])
    extra["mor_parts_rewritten"] = int(rep_m["parts_rewritten"])
    extra["cow_parts_rewritten"] = int(rep_c["parts_rewritten"])

    # --- selective small-part compaction (r5 rewrite_small_parts) ----------
    # trickle-append 8 tiny waves onto the cloned table, then merge ONLY
    # them: wall must scale with the selected kilobytes, not the table --
    # the healthy parts' bytes are never read (Delta OPTIMIZE shape).
    from embulk_output_s3_parquet_spark.jobs import rewrite_small_parts
    from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

    tbl = EncodedTable(dml_table)
    pol_t = tbl.policy()
    base_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for i in range(8):
        sl = base_docs.limit(64).select(
            F.concat(F.lit(f"trickle{i}:"), F.col("text").substr(1, 40)).alias("repo"),
            F.lit("t.py").alias("path"),
            F.sha1(F.concat(F.lit(str(i)), "text")).alias("commit"),
            F.lit("python").alias("lang"),
            F.col("text").alias("content"),
        )
        encode_job(
            spark, sl, dml_table, pol_t, if_exists="skip",
            part_base=2_000_000 + 1000 * i,
        )
    sizes = sorted(
        int(r["enc_bytes"]) for r in tbl.lineage().values()
    )
    thr = sizes[8] + 1 if len(sizes) > 9 else sizes[len(sizes) // 2]
    os.sync()
    t0 = time.time()
    rep_o = rewrite_small_parts(spark, dml_table, min_part_bytes=thr)
    extra["optimize_sec"] = round(time.time() - t0, 3)
    extra["optimize_parts_merged"] = int(rep_o["parts_rewritten"])
    extra["optimize_bytes_selected"] = int(rep_o["bytes_selected"])

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **extra,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
