"""Write-side IVF index: partition-pruned ANN search."""

from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.similarity import (
    ivf_build_index,
    ivf_search_index,
    ivf_topk,
)


def test_ivf_index_matches_inline_ivf(spark, sf_dir, tmp_path):
    """Searching the persisted index returns EXACTLY what the inline
    ivf_topk computes with the same centroids/probes — indexing changes
    the physical layout, never the answer."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 16)
    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, idx, n_centroids=8)

    inline = {(r.query_id, r.neighbor_id, r.rank, r.sim)
              for r in ivf_topk(emb, queries, k=5, n_centroids=8,
                                n_probe=2).collect()}
    indexed = {(r.query_id, r.neighbor_id, r.rank, r.sim)
               for r in ivf_search_index(spark, idx, queries, k=5,
                                         n_probe=2).collect()}
    assert indexed == inline and inline


def test_ivf_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The probed-list filter must reach the file listing: the parquet
    scan carries a partition filter on cid, so un-probed lists cost zero
    I/O — the property that makes IVF pay at 100 TB."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 4)
    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, idx, n_centroids=8)

    out = ivf_search_index(spark, idx, queries, k=3, n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cid" in m.group(1), plan
    # and the layout really is one directory per inverted list
    import glob
    lists = glob.glob(f"{idx}/cid=*")
    assert len(lists) == 8
