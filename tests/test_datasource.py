"""sources/datasource.py: the enctable Python DataSource V2.

Catalyst-facing integration: schema from the manifest, partitions from the
committed part dirs, filter pushdown into zone conjuncts (may-match: every
filter is also re-applied by Spark), and the columns option for projection
pruning (the Python DS API has no column-pruning hook in 4.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
    StringContains,
)

from embulk_output_s3_parquet_spark.jobs import encode_job
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
from embulk_output_s3_parquet_spark.sources.datasource import (
    EncodedTableDataSource,
    EncodedTableReader,
    filter_to_conjunct,
)


@pytest.fixture(scope="module")
def enc_docs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ds") / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    encode_job(
        spark, docs, path, CodecPolicy(chunk_rows=64), if_exists="error",
        cluster_by=["n_chars"],
    )
    spark.dataSource.register(EncodedTableDataSource)
    return path, docs


def test_filter_translation():
    names = {"a", "n"}
    assert filter_to_conjunct(GreaterThanOrEqual(("n",), 5), names) == ("n", ">=", 5)
    assert filter_to_conjunct(LessThan(("n",), 5), names) == ("n", "<", 5)
    assert filter_to_conjunct(EqualTo(("a",), "x"), names) == ("a", "==", "x")
    assert filter_to_conjunct(EqualTo(("zz",), 1), names) is None  # unknown col
    assert filter_to_conjunct(IsNotNull(("n",)), names) is None  # shape unsupported
    assert filter_to_conjunct(StringContains(("a",), "x"), names) is None


def test_push_filters_collects_conjuncts_and_returns_all(spark, enc_docs):
    path, _ = enc_docs
    schema = spark.read.format("enctable").load(path).schema
    reader = EncodedTableReader(path, schema, None)
    filters = [GreaterThanOrEqual(("n_chars",), 450), IsNotNull(("lang",))]
    leftover = list(reader.pushFilters(filters))
    assert leftover == filters  # may-match: Spark must re-apply everything
    assert reader._conjuncts == [("n_chars", ">=", 450)]
    assert len(reader.partitions()) >= 1


def test_dataframe_and_sql_reads_match_plain_table(spark, enc_docs):
    path, docs = enc_docs
    df = spark.read.format("enctable").load(path)
    assert df.count() == docs.count()
    got = df.filter(F.col("n_chars") >= 450).select("doc_id").orderBy("doc_id").collect()
    want = docs.filter(F.col("n_chars") >= 450).select("doc_id").orderBy("doc_id").collect()
    assert got == want
    df.createOrReplaceTempView("enc_docs_v")
    got2 = spark.sql(
        "select lang, count(*) c from enc_docs_v where n_chars >= 450 "
        "group by lang order by lang"
    ).collect()
    want2 = (
        docs.filter("n_chars >= 450").groupBy("lang").count()
        .withColumnRenamed("count", "c").orderBy("lang").collect()
    )
    assert got2 == want2


def test_columns_option_prunes_schema(spark, enc_docs):
    path, docs = enc_docs
    df = spark.read.format("enctable").option("columns", "doc_id,lang").load(path)
    assert [f.name for f in df.schema.fields] == ["doc_id", "lang"]
    assert df.count() == docs.count()
    with pytest.raises(Exception, match="unknown columns"):
        spark.read.format("enctable").option("columns", "nope").load(path).count()
