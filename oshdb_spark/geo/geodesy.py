"""Geodesic length/area with the reference's exact formulas (Geo.java).

The reference deliberately uses an equirectangular per-segment distance
approximation (NOT haversine) for lengths (Geo.java:37-45) and the
Chamberlain-Duquette spherical ring area as ported from mapbox/geojson-area
(Geo.java:147-179). Parity tests compare against hand-computed values, so
the formulas are reproduced term-for-term, vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6371000.0  # meters, Geo.java:19


def distance_equirect(lat1, lng1, lat2, lng2):
    """Equirectangular distance approximation (Geo.java:37-45)."""
    d_lat = np.radians(np.asarray(lat2) - np.asarray(lat1))
    d_lng = np.radians(np.asarray(lng2) - np.asarray(lng1))
    d_lng = d_lng * np.cos(np.radians((np.asarray(lat2) + np.asarray(lat1)) / 2.0))
    return EARTH_RADIUS * np.sqrt(d_lng * d_lng + d_lat * d_lat)


def distance_haversine(lat1, lng1, lat2, lng2):
    """Haversine distance (Geo.java:25-34; present but unused by default)."""
    d_lat = np.radians(np.asarray(lat2) - np.asarray(lat1))
    d_lng = np.radians(np.asarray(lng2) - np.asarray(lng1))
    a = np.sin(d_lat / 2) ** 2 + np.cos(np.radians(np.asarray(lat1))) * np.cos(
        np.radians(np.asarray(lat2))
    ) * np.sin(d_lng / 2) ** 2
    return EARTH_RADIUS * 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))


def length_of_line(coords: np.ndarray) -> float:
    """Sum of per-segment equirectangular distances (Geo.java:47-59).

    coords: (N,2) array of (lon, lat) degrees.
    """
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return 0.0
    return float(
        np.sum(
            distance_equirect(
                coords[:-1, 1], coords[:-1, 0], coords[1:, 1], coords[1:, 0]
            )
        )
    )


def ring_area_signed(coords: np.ndarray) -> float:
    """Chamberlain-Duquette signed spherical ring area (Geo.java:147-179).

    coords: (N,2) closed ring of (lon, lat) degrees (first == last, as JTS
    LinearRing.getCoordinates() returns). Positive if clockwise.

    The reference iterates i over ALL N coordinates of the closed ring with
    wrap-around index triples; reproduced exactly (including the duplicate
    closing coordinate's contribution) rather than simplified.
    """
    c = np.radians(np.asarray(coords, dtype=np.float64))
    n = len(c)
    if n <= 2:
        return 0.0
    lo = np.arange(n)
    mid = (lo + 1) % n
    hi = (lo + 2) % n
    area = float(np.sum((c[hi, 0] - c[lo, 0]) * np.sin(c[mid, 1])))
    return area * EARTH_RADIUS * EARTH_RADIUS / 2.0


def polygon_area(rings: list[np.ndarray]) -> float:
    """abs(outer) - sum(abs(holes)) (Geo.java:94-101)."""
    if not rings:
        return 0.0
    area = abs(ring_area_signed(rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_area_signed(hole))
    return area
