"""ANN scale path: multi-table hyperplane-LSH candidates + exact
re-rank must recover (nearly) the exact brute-force top-k."""

from __future__ import annotations

from indonesian_id_ocr_service_spark import queries_data as QD

SF = "/root/testdata/sf0.001"


def test_lsh_topk_recall_vs_exact(spark):
    exact = {(r.query_id, r.neighbor_id)
             for r in QD.q_ann_cosine_topk(spark, SF).collect()}
    lsh = {(r.query_id, r.neighbor_id)
           for r in QD.q_ann_lsh_bucket(spark, SF).collect()}
    assert exact, "exact baseline returned nothing"
    recall = len(exact & lsh) / len(exact)
    # L=12 tables × 4 planes measured at recall 1.0 on this data; 0.8
    # is the acceptance floor (single-table 8-bit LSH scores 0.0)
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8"
    # sims on shared pairs must agree exactly (same re-rank math)
    exact_sims = {(r.query_id, r.neighbor_id): r.sim
                  for r in QD.q_ann_cosine_topk(spark, SF).collect()}
    for r in QD.q_ann_lsh_bucket(spark, SF).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact_sims:
            assert abs(r.sim - exact_sims[key]) < 1e-9
