"""Geospatial functions over (lat, lon) columns.

The reference stores ``pos = [lat, lon]`` explicitly "for use in
geospatial indexing" (openstreet_kolkata.py:410-412 docstring) but never
implements any geo operation — this module supplies the missing surface,
as native column expressions:

- ``haversine_km``: great-circle distance.
- ``in_bbox``: bounding-box predicate (pushdown-friendly: it's plain
  comparisons on two double columns).
- ``grid_cell``: fixed-size lat/lon grid id — THE scalable spatial index:
  partition/bucket by cell and a radius query touches only the query
  cell's neighborhood, the spatial analog of LSH bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def _rad(c: Column) -> Column:
    return F.radians(c)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine formula, double precision)."""
    dlat = _rad(lat2 - lat1)
    dlon = _rad(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(_rad(lat1)) * F.cos(_rad(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_bbox(lat: Column, lon: Column, south: float, west: float,
            north: float, east: float) -> Column:
    return (
        (lat >= south) & (lat <= north) & (lon >= west) & (lon <= east)
    )


def grid_cell(lat: Column, lon: Column, cell_deg: float = 0.1) -> Column:
    """Grid-cell id 'x:y' at cell_deg resolution — partition key for
    spatial co-location."""
    x = F.floor(lon / cell_deg).cast("long")
    y = F.floor(lat / cell_deg).cast("long")
    return F.concat_ws(":", x.cast("string"), y.cast("string"))
