"""dedupe_archived_files_spark — a from-scratch, PySpark-native record-linkage /
duplicate-resolution engine with the query semantics of 0cwa/Dedupe-Archived-Files.

The reference (/root/reference) is a single-machine scan→hash→equi-join→group
duplicate-file finder (see SURVEY.md). This package re-expresses those semantics
as a cluster-scale pipeline over Common-Crawl-style web-page tables:

    pages --extract--> pages_text --block--> candidates --score--> edges
          --cluster--> clusters --resolve--> duplicates

Everything is declarative DataFrame API (Catalyst-optimized); Python only runs
inside Arrow-batched pandas UDFs, never per row.
"""

__version__ = "0.1.0"

from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark", "__version__"]
