from omop2obo_spark.operators.aggregate import (  # noqa: F401
    grouped_pivot_agg,
    ordered_concat_agg,
    ordered_concat_expr,
)
from omop2obo_spark.operators.joins import broadcast_join, salted_join  # noqa: F401
from omop2obo_spark.operators.reshape import (  # noqa: F401
    split_explode_columns,
    stack_columns,
    unstack_columns,
)
