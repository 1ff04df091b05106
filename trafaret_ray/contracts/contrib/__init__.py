"""Contrib namespace mirroring the reference layout
(``trafaret.contrib.rfc_3339``)."""
from . import rfc_3339  # noqa: F401
