from datafusion_ballista_dhruvil_spark.functions.compat import (
    avg_money,
    charge_expr,
    dec2,
    dec4,
    disc_price_expr,
    dsum,
    register_compat_functions,
)

__all__ = [
    "avg_money",
    "charge_expr",
    "dec2",
    "dec4",
    "disc_price_expr",
    "dsum",
    "register_compat_functions",
]
