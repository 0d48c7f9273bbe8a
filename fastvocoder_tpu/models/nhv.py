"""Neural Homomorphic Vocoder — intentionally unimplemented.

Parity note: the reference ships an *empty* `model/generator/nhv.py` and
lists NHV as a TODO (reference README.md:8, model/generator/nhv.py:0 bytes).
This stub preserves that surface: importing it works, constructing raises.
"""

from __future__ import annotations


class NHVGenerator:  # pragma: no cover — parity stub
    """Placeholder matching the reference's unimplemented NHV entry."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "NHV is unimplemented in the reference (an empty nhv.py / README "
            "TODO) and therefore intentionally unimplemented here."
        )
