"""Corpus-prep tour: the training-data pipeline operators end to end.

    python examples/corpus_prep.py [sf_dir]

Runs the composed corpus pipeline (quality filter -> exact dedup -> LSH
near-dedup census), then the per-signal operators a data team would
inspect alongside it: LM perplexity quality scores, token entropy, PMI
collocations, decontamination overlap, BM25 retrieval, PII redaction,
and finally shard assignment + sequence packing for training shards.
Everything is the same `queries()` surface the driver verifies against
DuckDB oracles — this script just walks it like a user would.
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_to_parquet_spark import get_spark
from api_to_parquet_spark.queries import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep", shuffle_partitions=8)
    qs = all_queries()

    print("=== corpus_pipeline: per-stage survivor census ===")
    qs["corpus_pipeline"](spark, sf_dir).show(truncate=False)

    print("=== bigram_perplexity: LM quality scores (worst 5) ===")
    qs["bigram_perplexity"](spark, sf_dir).orderBy(
        "avg_neg_logprob", ascending=False
    ).show(5, truncate=False)

    print("=== token_entropy: lexical diversity (least diverse 5) ===")
    qs["token_entropy"](spark, sf_dir).orderBy("entropy").show(5)

    print("=== token_pmi: strongest collocations ===")
    qs["token_pmi"](spark, sf_dir).show(10)

    print("=== decontaminate: eval-set 4-gram overlap ===")
    qs["decontaminate"](spark, sf_dir).orderBy(
        "n_shared_grams", ascending=False
    ).show(5)

    print("=== bm25_search: keyword retrieval ===")
    qs["bm25_search"](spark, sf_dir).show(5)

    print("=== pii_redact: compliance pass (sample) ===")
    qs["pii_redact"](spark, sf_dir).show(3, truncate=False)

    print("=== shard_assignment + sequence_packing ===")
    qs["shard_assignment"](spark, sf_dir).show(5)
    qs["sequence_packing"](spark, sf_dir).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
