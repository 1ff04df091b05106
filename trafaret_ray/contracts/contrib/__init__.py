"""Contrib namespace mirroring the reference layout
(``trafaret.contrib.rfc_3339``, ``trafaret.contrib.object_id``)."""
from . import object_id  # noqa: F401
from . import rfc_3339  # noqa: F401
