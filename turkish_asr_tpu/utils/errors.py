"""Shared error types importable from package code.

Lives inside the package (not the top-level ``inference.py`` script) so
deployments that import ``turkish_asr_tpu`` without the repo root on
``sys.path`` — installed package, different cwd — can still classify
these errors. ``inference.py`` re-exports them for back-compat.
"""


class TimestampsUnsupportedError(ValueError):
    """timestamps=True requested on a decoder without frame alignments
    (beam search). A dedicated type so servers can map it to 400 without
    reclassifying every internal ValueError as a client error."""
