"""Declared operator inventory (SURVEY.md §2.B).

Importing this package registers every query into
:mod:`tpctools_spark.registry`. One module per §2.B category.
"""

from tpctools_spark.queries import (  # noqa: F401
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sorts_sets,
    scalars,
    eventtime,
    tpch,
    tpch_generated,
    dedup,
    similarity,
    textstats,
    streaming_demo,
    multimodal,
    tpcds_demo,
    tpcds_demo2,
    tpcds_demo3,
    tpcds_demo4,
    tpcds_demo5,
    tpcds_demo6,
    tpcds_demo7,
    tpcds_demo8,
    tpcds_demo9,
    tpcds_demo10,
    scale_patterns,
    subqueries,
    pipeline,
    reshape,
    quality,
    mining,
    graph,
    retrieval,
    corpusgen,
    features,
)
