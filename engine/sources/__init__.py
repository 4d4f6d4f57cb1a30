"""Source connectors.

The reference's only source is a directory of UTF-8 text files
(SURVEY.md F1, ``manager/__main__.py:193``); ours generalizes to the
formats a Spark deployment actually reads. Everything returns plain
DataFrames so the operator layer is source-agnostic.
"""

from engine.sources.text import read_text_dir
from engine.sources.tabular import read_csv, read_json, read_orc, read_parquet, write_orc

__all__ = ["read_text_dir", "read_csv", "read_json", "read_orc", "read_parquet", "write_orc"]
