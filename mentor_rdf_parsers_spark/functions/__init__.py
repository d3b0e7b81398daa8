"""Tooling-facing helper functions (token metadata + navigation).

The distributed engine keeps its hot-path logic in ``operators/`` and
``parsing/``; this package is the driver-side API surface for building
formatters, highlighters and language tooling on the same token
vocabulary (reference ``src/utils.ts`` and ``src/token-metadata.ts``).
"""

from .token_metadata import (  # noqa: F401
    TokenMetadata,
    get_token_metadata,
    has_token_flag,
)
from .token_nav import (  # noqa: F401
    BLANK_NODE_TOKEN_NAMES,
    get_blank_node_id_from_token,
    get_first_token_of_type,
    get_last_token_of_type,
    get_next_token,
    get_prefix_from_token,
    get_previous_token,
    get_token_at_offset,
    get_token_position,
    is_upper_case_token,
    is_variable_token,
    split_prefixed_name,
)
