"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY §4) — Catalyst provides
pushdown/pruning/join-selection for free *if* the plan is declared
properly. These helpers make those properties assertable in tests and
inspectable in tuning sessions, so "the filter reached the scan" and
"the dim side broadcast" are regression-tested facts, not hopes.
"""

from .inspect import (  # noqa: F401
    broadcast_join_count,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    uses_top_k,
    wholestage_codegen_spans,
)
