"""tiktoken-tpu: a TPU-native BPE tokenizer framework.

Drop-in API surface for the reference library (``Encoding``,
``get_encoding``, ``encoding_for_model``...), with the compute path
rebuilt TPU-first: the pre-tokenizer regex is compiled to a char-level
scanner automaton executed as gather-free XLA select sweeps (Pallas was
measured out on the current toolchain — HARDWARE.md), pieces are probed
against an in-device vocabulary table and merged in lane-aligned slots,
and the whole pipeline shards over device meshes for corpus-scale
throughput.
"""

from tiktoken_tpu.core import Encoding as Encoding
from tiktoken_tpu.model import (
    encoding_for_model as encoding_for_model,
    encoding_name_for_model as encoding_name_for_model,
)
from tiktoken_tpu.registry import (
    get_encoding as get_encoding,
    list_encoding_names as list_encoding_names,
)

__version__ = "0.3.0"
