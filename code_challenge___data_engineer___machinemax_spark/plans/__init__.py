"""Import all plan modules so their @query registrations run."""

from . import reference_queries  # noqa: F401
from . import relational  # noqa: F401
from . import tpch_queries  # noqa: F401
from . import text_pipeline  # noqa: F401
from . import dedup_queries  # noqa: F401
from . import similarity_queries  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import functions_queries  # noqa: F401
from . import ranking_queries  # noqa: F401
from . import sampling_queries  # noqa: F401
from . import advanced_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import pipeline_queries  # noqa: F401
from . import timeseries_queries  # noqa: F401
from . import sketch_queries  # noqa: F401
from . import layout_queries  # noqa: F401
from . import feature_queries  # noqa: F401
from . import recsys_queries  # noqa: F401
from . import behavior_queries  # noqa: F401
from . import graph_queries  # noqa: F401
from . import governance_queries  # noqa: F401
from . import packing_queries  # noqa: F401

from .registry import all_oracles, all_queries  # noqa: F401
