from .scalars import (  # noqa: F401
    season, season_year, fractional_years, severity_from_z,
    anomaly_label, percentile_bin,
)
