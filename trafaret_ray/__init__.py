"""trafaret_ray — a Ray-Data-native feature-engineering engine.

Recasts the reference's composable schema contracts (Deepwalker/trafaret)
as vectorized Arrow-batch validators gating a point-in-time feature
pipeline over Parquet transcript tables. See SURVEY.md for the blueprint.
"""

__version__ = '0.1.0'
