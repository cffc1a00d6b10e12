"""nipper_ray: a Ray-Data-native HTML extraction + crawl-frontier engine.

Reimplements the query/data-processing capabilities of the reference
HTML-selector library (importcjj/nipper) on top of ray.data Datasets:
the DOM parse + CSS-selector kernel runs inside map_batches UDFs over
Arrow batches of Common-Crawl-style pages; the crawl frontier (URL-seen
set, politeness, priority) is built from Ray Data shuffles and actor
pools.
"""

__version__ = "0.1.0"
