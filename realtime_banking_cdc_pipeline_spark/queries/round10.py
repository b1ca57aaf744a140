"""Round-10 queries: linear-bound mutual-kNN twin and composed
corpus-pipeline stages.

Reference parity: the reference repo's analytics tier has no graph or
embedding operators (its compute is dbt SQL over banking CDC rows —
see SURVEY.md §2.9); this module continues the LLM-data-pipeline
extension mandated by the build brief, on the same house substrate
(two-level quantizer cells, exact-dup contraction, per-cell budgets)
as queries/round6b.py-round9.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .round9 import _dd_mknn_sql, _mknn_result

# ---------------------------------------------------------------------------
# x_mutual_knn_capped — the explicitly-approximate linear-bound twin
# ---------------------------------------------------------------------------

# Per-cell pair budget shared with the SemDeDup capped family
# (queries/round8.py _SEM_CAP): each cell's pair-emitting side is its
# top-64 members by (cosine-to-centroid DESC, vec_id ASC).
from .round8 import _SEM_CAP as _MKNN_CAP  # noqa: E402


@query(
    "x_mutual_knn_capped",
    _dd_mknn_sql(cap=_MKNN_CAP),
    doc=(
        "x_mutual_knn_clusters with the LINEAR pair stage: after the "
        "exact-dup contraction, each cell's pair-emitting side is "
        "capped to its top-64 DISTINCT embeddings by "
        "(cosine-to-centroid DESC, vec_id ASC) — the same house "
        "budget as x_semdedup_capped — so candidate pairs <= "
        "64 * N_distinct at ANY skew, vs the exact twin's within-cell "
        "quadratic term in the distinct-heavy regime (sparse sf10p: "
        "200k distinct vectors, exact twin 162.5 s). EXPLICITLY "
        "APPROXIMATE: a non-capset vector only sees its cell's 64 "
        "anchors as kNN candidates, so its top-5 may differ from the "
        "exact graph where a cell holds > 64 distinct embeddings; "
        "when no cell exceeds the cap the result IS "
        "x_mutual_knn_clusters (pinned by test_round10_properties at "
        "sf0.001, where the largest cell is far below 64). Mutuality, "
        "min-label components, degree accounting, and the "
        "replica-group expansion are shared code "
        "(round9._mknn_result)."
    ),
)
def x_mutual_knn_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mknn_result(spark, sf_dir, cap=_MKNN_CAP)
