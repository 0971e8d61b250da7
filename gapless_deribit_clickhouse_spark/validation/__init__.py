from gapless_deribit_clickhouse_spark.validation.quality import (
    coverage_by_group,
    gap_analysis,
    quality_metrics,
)

__all__ = ["coverage_by_group", "gap_analysis", "quality_metrics"]
