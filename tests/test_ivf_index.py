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


def test_ivf_index_quantized_recall_and_size(spark, sf_dir, tmp_path):
    """quantize=True stores int8 codes + scale (4x smaller on disk than
    float vectors); search dequantizes at rerank and keeps >=0.8 top-5
    recall vs the full-precision index."""
    import glob
    import os

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 16)
    full_idx = str(tmp_path / "ivf_full")
    q_idx = str(tmp_path / "ivf_q8")
    ivf_build_index(emb, full_idx, n_centroids=8)
    ivf_build_index(emb, q_idx, n_centroids=8, quantize=True)

    sz = lambda p: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(f"{p}/seg=*/cid=*/*.parquet")
    )
    assert sz(q_idx) < sz(full_idx) * 0.5  # int8 + scale vs float32

    schema = spark.read.parquet(q_idx).schema
    assert schema["qvec"].dataType.elementType.typeName() == "byte"

    full = {(r.query_id, r.neighbor_id)
            for r in ivf_search_index(spark, full_idx, queries, k=5,
                                      n_probe=2).collect()}
    quant = {(r.query_id, r.neighbor_id)
             for r in ivf_search_index(spark, q_idx, queries, k=5,
                                       n_probe=2).collect()}
    assert len(full & quant) / len(full) >= 0.8


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
    lists = glob.glob(f"{idx}/seg=*/cid=*")
    assert len(lists) == 8


def test_ivf_extend_and_layout_guard(spark, sf_dir, tmp_path):
    """Extend appends under the index's OWN stored centroids and
    quantization mode; an exhaustive search (n_probe = n_centroids)
    after the extend equals brute force over the union — the
    quantizer-independent append pin. A tree without the layout stamp
    is refused by search AND extend."""
    import pytest

    from configurable_etl_python_repo_spark.llm.similarity import (
        brute_force_topk,
        ivf_extend_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    part_a = emb.where(F.col("vec_id") % 3 != 2)
    part_b = emb.where(F.col("vec_id") % 3 == 2)
    queries = emb.where(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    ivf_build_index(part_a, idx, n_centroids=8)
    ivf_extend_index(part_b, idx)
    got = {(r.query_id, r.neighbor_id, r.rank, r.sim)
           for r in ivf_search_index(spark, idx, queries, k=5,
                                     n_probe=8).collect()}
    want = {(r.query_id, r.neighbor_id, r.rank, r.sim)
            for r in brute_force_topk(emb, queries, k=5).collect()}
    assert got == want and got
    # quantized store: extend respects the stored mode (qvec schema)
    qidx = str(tmp_path / "ivf_q")
    ivf_build_index(part_a, qidx, n_centroids=8, quantize=True)
    ivf_extend_index(part_b, qidx)
    schema = spark.read.parquet(qidx).schema
    assert "qvec" in schema.names
    quant = {(r.query_id, r.neighbor_id)
             for r in ivf_search_index(spark, qidx, queries, k=5,
                                       n_probe=8).collect()}
    want_ids = {(a, b) for a, b, _, _ in want}
    assert len(quant & want_ids) / len(want_ids) >= 0.8
    # layout guard: forge a meta-less tree shape (old layout)
    spark.createDataFrame([(8,)], "n_centroids int").coalesce(
        1
    ).write.mode("overwrite").parquet(idx + "/_meta")
    with pytest.raises(ValueError, match="layout"):
        ivf_search_index(spark, idx, queries, k=5).collect()
    with pytest.raises(ValueError, match="layout"):
        ivf_extend_index(part_b, idx)
