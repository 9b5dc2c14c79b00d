"""ML-pipeline surface (SURVEY.md §2.7, milestone M4)."""

from .flight_delay import (  # noqa: F401
    FlightDelayPipeline,
    clean_flights,
    featurize,
)
