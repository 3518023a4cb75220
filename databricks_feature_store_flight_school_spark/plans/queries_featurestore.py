"""Feature-store surface queries (registry, lookup joins, merge, scoring).

Populated alongside the featurestore package; see that package for the
engine implementation.
"""
