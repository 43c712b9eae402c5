"""Skewed-replica probe for x35's salted probability join (VERDICT r5
item 3 acceptance): on a corpus where ONE bigram carries ~half the
mass, time ``lm_scores`` with the skew split ON vs OFF under the
at-scale join shape (auto-broadcast disabled, so the cold side
shuffles and a hot key would otherwise land on ONE reducer).

The sf0.x testdata is near-uniform (30-token vocab) — skew never
bites there, which is why the r5 x10 ratio critique (3.68) was about
vocabulary growth, not stragglers. This probe builds the straggler
shape explicitly: `hot_share` of all bigram instances are the same
key, the rest spread over a synthetic vocabulary.

Prints one JSON line with both timings and the ratio; the salted
path must win (ratio < 1) for the probe to exit 0.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from streaming_data_spark.operators.text import lm_scores  # noqa: E402
from streaming_data_spark.session import get_session  # noqa: E402

N_DOCS = int(os.environ.get("SKEW_PROBE_DOCS", "1000000"))
HOT_SHARE = 0.8  # fraction of documents that are pure hot-bigram runs
DOC_TOKENS = 30


def main() -> int:
    spark = get_session("skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_hot = int(N_DOCS * HOT_SHARE)
    # hot docs: 30 repetitions of 'aa' -> 29 instances of bigram (aa,aa)
    # cold docs: tokens drawn from a ~40k synthetic vocab, id-derived
    hot_text = " ".join(["aa"] * DOC_TOKENS)
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, hot_text)
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        ((F.col("id") * 31 + i * 7919) % 40000).cast("string"),
                    )
                    for i in range(DOC_TOKENS)
                ],
            )
        )
        .alias("text"),
    )
    docs = docs.localCheckpoint()  # materialize input outside the timed region
    timings: dict[str, float] = {}
    for label, kw in (
        ("warmup", {"hot_frac": None}),
        ("unsalted", {"hot_frac": None}),
        ("salted", {}),  # auto threshold: 'aa aa' at ~80% ≫ 4/32
        ("unsalted2", {"hot_frac": None}),
        ("salted2", {}),
    ):
        t0 = time.time()
        n = lm_scores(docs, **kw).count()
        timings[label] = round(time.time() - t0, 3)
        assert n == N_DOCS, n
    best_un = min(timings["unsalted"], timings["unsalted2"])
    best_sa = min(timings["salted"], timings["salted2"])
    ratio = round(best_sa / best_un, 3)
    print(
        json.dumps(
            {
                "metric": "x35_skew_probe",
                "n_docs": N_DOCS,
                "hot_share": HOT_SHARE,
                "unsalted_sec": best_un,
                "salted_sec": best_sa,
                "salted_over_unsalted": ratio,
            }
        )
    )
    return 0 if ratio < 1.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
