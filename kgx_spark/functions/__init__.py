"""Column-expression ports of the reference's scalar utilities.

Everything here returns pyspark Column expressions (JVM-side, codegen'd) —
never row-at-a-time Python. The reference implements these as LRU-cached
Python functions called per record (kgx/prefix_manager.py, kgx/utils/).
"""

from kgx_spark.functions.curie import (  # noqa: F401
    contract,
    curie_prefix,
    curie_reference,
    expand,
    is_curie,
    is_iri,
)
from kgx_spark.functions.infores import infores_curie  # noqa: F401
from kgx_spark.functions.keys import deterministic_edge_id, edge_key  # noqa: F401
from kgx_spark.functions.text import (  # noqa: F401
    camel_case,
    format_biolink_category,
    format_biolink_slot,
    sentence_case,
    snake_case,
)
