"""Hive scalar/UDAF function surface (SURVEY §2.9).

Spark ships natives for ~95% of the reference's 294 registrations
(exec/FunctionRegistry.java:193-536). This package provides:

- ``hive_function_map()`` — the full name→implementation mapping, so a
  reference user can look up any Hive function name and get the Spark
  expression for it (natives referenced by name, gaps implemented here);
- implementations for the gaps: ngrams, context_ngrams, in_file,
  parse_url_tuple, sort_array_by, field, create_union/extract_union
  (uniontype encoding, SURVEY §1.3), masking wrappers.

Everything is a Column expression (JVM-side); no row-at-a-time Python.
"""

from hive_2_3_2_spark.functions.gaps import (
    context_ngrams,
    create_union,
    extract_union,
    field,
    in_file,
    in_file_join,
    mask,
    mask_first_n,
    mask_hash,
    mask_show_first_n,
    ngrams,
    parse_url_tuple,
    sort_array_by,
)
from hive_2_3_2_spark.functions.registry import hive_function_map

__all__ = [
    "context_ngrams",
    "create_union",
    "extract_union",
    "field",
    "hive_function_map",
    "in_file",
    "in_file_join",
    "mask",
    "mask_first_n",
    "mask_hash",
    "mask_show_first_n",
    "ngrams",
    "parse_url_tuple",
    "sort_array_by",
]
