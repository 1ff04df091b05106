"""Alias module matching the reference import path
(reference trafaret/contrib/rfc_3339.py)."""
from ..contrib_rfc3339 import Date, DateTime  # noqa: F401
