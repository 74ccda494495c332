"""Training-data-ops demo: the beyond-reference operator surface over the
sf0.001 tables — dedup family, sketches, similarity, windows, curation.

Each call returns a lazy ray.data.Dataset; nothing materializes until the
print.  Run: python examples/demo_training_data_ops.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001"):
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    try:
        from paddleocr_json_ray.ops import dedup, relational, similarity, sketches, windows

        survivors = dedup.dedup_minhash(sf_dir).count()
        exact = dedup.dedup_exact(sf_dir).count()
        print(f"dedup: {exact} exact survivors, {survivors} after MinHash-LSH")

        hh = sketches.heavy_hitters(sf_dir, k=5).to_pandas()
        print("top words:", ", ".join(
            f"{r.word}({r.count_lo})" for r in hh.itertuples()))

        td = sketches.price_quantiles_tdigest(sf_dir).to_pandas().iloc[0]
        print(f"price quantiles (t-digest): p50={td.p50:.0f} "
              f"p90={td.p90:.0f} p99={td.p99:.0f}")

        knn = similarity.knn_brute(sf_dir, n_queries=2, k=3).to_pandas()
        print("knn:", knn.to_dict("records"))

        sess = windows.user_sessions(sf_dir).to_pandas()
        print(f"sessions: {len(sess)} sessions over "
              f"{sess.user_id.nunique()} users")

        stats = relational.value_stats_by_type(sf_dir).to_pandas()
        print(stats.to_string(index=False))
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
