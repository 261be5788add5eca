"""Query registry backing ``__spark_entry__``.

Importing this package registers every query module; ``QUERIES`` /
``ORACLE`` are then complete.
"""

from .registry import ORACLE, QUERIES, load  # noqa: F401

# Import order groups SURVEY.md §2 Part A first, then the relational
# vocabulary, then the Part C / training-data extensions.
from . import etl_queries  # noqa: E402,F401
from . import source_queries  # noqa: E402,F401
from . import sink_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import advanced_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import mllib_queries  # noqa: E402,F401
