"""Host utilities: time, hierarchical timing registry, id provider."""

from .ids import IdProvider  # noqa: F401
from .timing import Timer, Timing  # noqa: F401
from .time import (  # noqa: F401
    NSEC_PER_SEC,
    duration_from_sec,
    ns_from_sec,
    sec_from_ns,
)
