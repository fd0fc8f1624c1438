"""scrappy_ray — a Ray-Data-native crawl-and-extract engine.

From-scratch reimplementation of the capabilities of josei/scrappy
(reference at /root/reference, Ruby) on top of ray.data.Dataset:

- ``scrappy_ray.extractor`` — pure-Python RDF-selector extraction core
  (replicates the reference's selector algebra + fragment walk exactly).
- ``scrappy_ray.crawl`` — BFS-superstep crawler: frontier Datasets,
  sharded URL-seen actors, per-host politeness, checkpoint/resume.
- ``scrappy_ray.stages`` — Ray Data stages (fetch-as-lookup, extraction
  actor pool, global sequence assignment).
- ``scrappy_ray.functions`` — large-scale training-data ops: dedup
  (exact/MinHash-LSH/SimHash/Jaccard/embedding), similarity search,
  text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"
