"""Dump .explain('formatted') for named queries to plans/r07/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
With no query names, dumps every bench headliner. Planning only — nothing
executes, so this is safe to run alongside a bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HEADLINERS = [
    "extract_transcripts",
    "q_pricing_summary", "q_top_revenue_customers", "q_events_sessions",
    "q_doc_token_stats", "q_exact_dedup", "q_minhash_lsh_pairs",
    "q_lsh_jaccard_verified", "q_near_dup_clusters", "q_ann_topk",
    "x_ivf_ann_topk", "q_structured_extract", "q_extract_plain_docs",
    "q_curation_pipeline", "q_asof_join", "q_range_join", "q_decontaminate",
    "q_token_budget_mix", "q_sliding_chunks", "q_weighted_sample",
    "q_corpus_drift", "q_semantic_decontaminate", "q_fuzzy_pairs",
    "q_pack_context", "q_duplicate_spans", "q_media_decode",
    "q_audio_decode", "q_video_frames", "q_lm_quality", "q_hybrid_rrf",
    "q_snapshot_diff", "q_outlier_events", "q_bpe_encode",
    "q_quality_calibrate", "q_kmv_distinct", "q_crawl_budget",
    "q_dsir_weights", "q_conv_paths", "q_cluster_rep",
    "q_lexical_diversity", "x_mutual_top1_srp",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n in HEADLINERS if n != "extract_transcripts"]

    import __spark_entry__ as entry
    from document_extraction_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
