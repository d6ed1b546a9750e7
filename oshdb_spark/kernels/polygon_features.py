"""Full polygon-features area-decision corpus.

Derived from the PUBLIC osm polygon-features definition file that the
reference loads at runtime (oshdb/src/main/resources/json/
polygon-features.json, consumed by DefaultTagInterpreter.java:80-120).
Semantics reproduced exactly:

- "all":       any value except "no" makes a closed way an area
               (InvertedHashSet seeded with the "no" value id)
- "whitelist": value must be one of the listed values — the loader
               ALSO adds the "no" value to every whitelist
               (DefaultTagInterpreter.java:103, reproduced verbatim)
- "blacklist": any value NOT in the listed values

The separate area=no override (BaseTagInterpreter.java:50-52) and the
closed-ring precheck live in kernels.geometry_builder.
"""

# mode: "all" | "whitelist" | "blacklist"
POLYGON_FEATURES: dict[str, tuple[str, frozenset[str]]] = {
    'building': ('all', frozenset()),
    'highway': ('whitelist', frozenset({'elevator', 'escape', 'no', 'rest_area', 'services'})),
    'natural': ('blacklist', frozenset({'arete', 'cliff', 'coastline', 'ridge', 'tree_row'})),
    'landuse': ('all', frozenset()),
    'waterway': ('whitelist', frozenset({'boatyard', 'dam', 'dock', 'no', 'riverbank'})),
    'amenity': ('all', frozenset()),
    'leisure': ('all', frozenset()),
    'barrier': ('whitelist', frozenset({'city_wall', 'ditch', 'hedge', 'no', 'retaining_wall', 'spikes', 'wall'})),
    'railway': ('whitelist', frozenset({'no', 'platform', 'roundhouse', 'station', 'turntable'})),
    'area': ('all', frozenset()),
    'boundary': ('all', frozenset()),
    'man_made': ('blacklist', frozenset({'cutline', 'embankment', 'pipeline'})),
    'power': ('whitelist', frozenset({'generator', 'no', 'plant', 'substation', 'transformer'})),
    'place': ('all', frozenset()),
    'shop': ('all', frozenset()),
    'aeroway': ('blacklist', frozenset({'taxiway'})),
    'tourism': ('all', frozenset()),
    'historic': ('all', frozenset()),
    'public_transport': ('all', frozenset()),
    'office': ('all', frozenset()),
    'building:part': ('all', frozenset()),
    'military': ('all', frozenset()),
    'ruins': ('all', frozenset()),
    'area:highway': ('all', frozenset()),
    'craft': ('all', frozenset()),
    'golf': ('all', frozenset()),
    'indoor': ('all', frozenset()),
}
