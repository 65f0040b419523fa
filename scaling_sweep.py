#!/usr/bin/env python
"""Scaling-exponent measurement for the corpus-scale operator family.

Runs the headline dedup/similarity entries at several corpus sizes
(same deterministic generator as bench.py) and prints time-vs-n with a
fitted power-law exponent per entry: t ≈ c·n^k.  Near-linear k is the
evidence the 100 TB posture rests on (SCALING.md records the measured
table); a superlinear k flags the operator for redesign.

Usage: python scaling_sweep.py [n1 n2 ...]   (default 50k 150k 300k 500k)
Each (entry, n) is timed twice after a warm-up entry; the MIN is kept
(scheduling noise is one-sided).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_scaled_corpus, corpus_scale_entries  # noqa: E402
from data_transformation_python_spark.session import get_spark  # noqa: E402

ENTRIES = [
    "dedup_minhash_lsh",
    "dedup_pipeline_survivors",
    "sim_embedding_neardup",
    "dedup_connected_components",
    "dedup_incremental",
    "dedup_semantic_clusters",
    # round 8: the serving + sketch families — the ADC distance-table
    # join and Bloom broadcast probe were the newest plans and had
    # never been swept; their exponents should be ≲ 1
    "sim_ivfpq_topk",
    "sim_pq_adc_topk",
    "sketch_bloom_decontam",
    "decontam_ngram",
    "sim_ivf_topk_auto",
    "dedup_semantic_auto",
    # round 8b: the HLL register build — constant-output MAX shuffle,
    # should be flat-to-linear in corpus size
    "sketch_hll_tokens",
    # round 8c: the newest plans — candidate-bounded levenshtein
    # confirm, the MG count-shuffle, SQ8 broadcast serving, and the
    # vocab-iteration BPE trainer; all should be ≲ linear
    "dedup_editdist_verify",
    "sketch_mg_heavyhitters",
    "sim_sq8_topk",
    "text_bpe_learn",
    # round 8d: maximal-span extraction (broadcast probe + per-doc
    # window), bigram stupid-backoff LM scoring (count joins), and
    # the constant-cell HDR quantile sketch — expected ≲ linear, with
    # hdr flat-ish (output size is constant in corpus size)
    "dedup_span_extract",
    "text_lm_backoff",
    "sketch_hdr_quantiles",
    # round 8e: PageRank — edge build is the corpus-sized half, the
    # 3 iterations run on vocab-sized state; expected ≲ linear
    "graph_pagerank_tokens",
    "text_vocab_growth",
    # round 8f: image dHash near-dup (constant-size clusters ⇒ pair
    # volume linear; the decode/hash map is embarrassingly parallel)
    # and the ExactSubstr trim (span extract + array-side filtering)
    "multimodal_dhash_neardup",
    "dedup_span_trim",
    # round 8g: BM25 one-shot retrieval — one scan + broadcast stats,
    # expected ~linear with a tiny constant
    "text_bm25_topk",
]


def main() -> None:
    # SWEEP_ENTRIES=a,b,c restricts the run (re-sweeping one family
    # shouldn't cost a full pass over all of them)
    global ENTRIES
    sel = os.environ.get("SWEEP_ENTRIES")
    if sel:
        ENTRIES = [e.strip() for e in sel.split(",") if e.strip()]
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 150_000, 300_000, 500_000]
    spark = get_spark(app_name="dtps-scaling-sweep")
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, dict[int, float]] = {e: {} for e in ENTRIES}
    for n in sizes:
        corpus_dir = build_scaled_corpus(spark, n)
        entries = {
            name: thunk
            for name, thunk in corpus_scale_entries(spark, corpus_dir)
            if name in ENTRIES
        }
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for name in ENTRIES:
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    entries[name]().write.format("noop").mode("overwrite").save()
                    ts.append(time.perf_counter() - t0)
                    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                        rdd.unpersist()
                results[name][n] = round(min(ts), 3)
                print(f"  {name} @ {n}: {results[name][n]} s", file=sys.stderr)
    fits = {}
    for name, pts in results.items():
        xs = sorted(pts)
        if len(xs) >= 2:
            lx = [math.log(x) for x in xs]
            ly = [math.log(max(pts[x], 1e-3)) for x in xs]
            mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
            k = sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / sum(
                (a - mx) ** 2 for a in lx
            )
            fits[name] = round(k, 2)
    print(json.dumps({"times": results, "exponent": fits}, indent=1))


if __name__ == "__main__":
    main()
