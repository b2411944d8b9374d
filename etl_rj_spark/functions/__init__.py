"""Scalar column kernels (SURVEY.md §2.8): string, date, numeric.

All pure ``Column -> Column`` expressions — JVM-side, codegen'd, no
Python UDFs. Each kernel documents the reference behavior it
reproduces (citations are file:line into /root/reference).
"""

from etl_rj_spark.functions.exprs import bind_once  # noqa: F401
from etl_rj_spark.functions.dates import (  # noqa: F401
    MONTH_EN_ES,
    MONTH_ES_EN,
    date_default,
    iso_format,
    month_name,
    parse_date,
    parse_date_lenient,
    temporal_dims,
)
from etl_rj_spark.functions.numeric import (  # noqa: F401
    parse_int_thousands,
    to_number,
    to_number_default,
)
from etl_rj_spark.functions.strings import (  # noqa: F401
    clean_customer_name,
    norm_lower,
    norm_upper,
    parse_money,
    parse_money_default,
    parse_plain_money,
    parse_plain_money_default,
    recode_values,
    truncate,
)
