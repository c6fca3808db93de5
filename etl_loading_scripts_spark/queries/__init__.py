"""Named query registry: SURVEY §2 operator inventory + extension operators.

Importing this package registers every query module. ``REGISTRY`` maps
query name → :class:`Query` (Spark callable + DuckDB oracle SQL).
"""

from etl_loading_scripts_spark.registry import REGISTRY, Query, register

# import for side effect: each module registers its queries
from etl_loading_scripts_spark.queries import reference as _reference  # noqa: F401
from etl_loading_scripts_spark.queries import analytics as _analytics  # noqa: F401
from etl_loading_scripts_spark.queries import segmentation as _segmentation  # noqa: F401
from etl_loading_scripts_spark.llm import dedup as _dedup  # noqa: F401
from etl_loading_scripts_spark.llm import similarity as _similarity  # noqa: F401
from etl_loading_scripts_spark.llm import text as _text  # noqa: F401
from etl_loading_scripts_spark.llm import multimodal as _multimodal  # noqa: F401
from etl_loading_scripts_spark.streaming import events as _events  # noqa: F401
from etl_loading_scripts_spark.queries import pipeline_e2e as _pipeline_e2e  # noqa: F401
from etl_loading_scripts_spark.streaming import stateful as _stateful  # noqa: F401
from etl_loading_scripts_spark.llm import corpus as _corpus  # noqa: F401
from etl_loading_scripts_spark.llm import decontam as _decontam  # noqa: F401
from etl_loading_scripts_spark.llm import sampling as _sampling  # noqa: F401
from etl_loading_scripts_spark.llm import privacy as _privacy  # noqa: F401
from etl_loading_scripts_spark.operators import quality as _quality  # noqa: F401
from etl_loading_scripts_spark.queries import graph as _graph  # noqa: F401
from etl_loading_scripts_spark.queries import cohorts as _cohorts  # noqa: F401
from etl_loading_scripts_spark.operators import cdc as _cdc  # noqa: F401
from etl_loading_scripts_spark.llm import corpus_stats as _corpus_stats  # noqa: F401
from etl_loading_scripts_spark.llm import semdedup as _semdedup  # noqa: F401
from etl_loading_scripts_spark.llm import search as _search  # noqa: F401
from etl_loading_scripts_spark.sources import layout as _layout  # noqa: F401
from etl_loading_scripts_spark.queries import advanced as _advanced  # noqa: F401
from etl_loading_scripts_spark.operators import skew as _skew  # noqa: F401
from etl_loading_scripts_spark.queries import cow_queries as _cow_queries  # noqa: F401
from etl_loading_scripts_spark.streaming import cdc_bridge as _cdc_bridge  # noqa: F401
from etl_loading_scripts_spark.sources import flatfile as _flatfile  # noqa: F401
from etl_loading_scripts_spark.functions import sql_udfs as _sql_udfs  # noqa: F401
from etl_loading_scripts_spark.pipeline import sql_script as _sql_script  # noqa: F401
from etl_loading_scripts_spark.queries import entity_resolution as _entity_resolution  # noqa: F401

__all__ = ["REGISTRY", "Query", "register"]
from etl_loading_scripts_spark.sources import skipping as _skipping  # noqa: F401
from etl_loading_scripts_spark.sources import warc as _warc  # noqa: F401
from etl_loading_scripts_spark.sources import pruning as _pruning  # noqa: F401
from etl_loading_scripts_spark.sources import arrowipc as _arrowipc  # noqa: F401
from etl_loading_scripts_spark.sources import tfrecord as _tfrecord  # noqa: F401
from etl_loading_scripts_spark.operators import deltalog as _deltalog  # noqa: F401
from etl_loading_scripts_spark.llm import html as _html  # noqa: F401
from etl_loading_scripts_spark.llm import webplib as _webplib  # noqa: F401
from etl_loading_scripts_spark.llm import annindex as _annindex  # noqa: F401
from etl_loading_scripts_spark.llm import nativeimg as _nativeimg  # noqa: F401
from etl_loading_scripts_spark.llm import mp4 as _mp4  # noqa: F401
from etl_loading_scripts_spark.sources import compressed as _compressed  # noqa: F401
from etl_loading_scripts_spark.operators import lineage as _lineage  # noqa: F401
from etl_loading_scripts_spark.streaming import delta_tail as _delta_tail  # noqa: F401
