from gapless_deribit_clickhouse_spark.core.session import get_spark, stop_spark
from gapless_deribit_clickhouse_spark.core.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "stop_spark", "TABLES", "load_tables", "register_views"]
