"""Sequential reference-exact classifier (compatibility facade).

The classification semantics live in kaiju_tpu.engine.core as per-read
coroutines; this module re-exports the synchronous driver under the
historical names.
"""

from .core import (  # noqa: F401
    ClassifyResult,
    ExactClassifier,
    Fragment,
    format_output_line,
)
