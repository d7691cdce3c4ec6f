"""Encoding registry and plugin discovery.

Behaviour matches the reference registry (reference: tiktoken/registry.py):
a thread-safe, lazily-populated singleton cache of ``Encoding`` objects,
plugin discovery by scanning the ``tiktoken_tpu_ext`` namespace package,
errors on duplicate encoding names or plugins missing
``ENCODING_CONSTRUCTORS``, and idempotent failure (a failed discovery can
be retried).
"""

from __future__ import annotations

import functools
import importlib
import pkgutil
import threading
from typing import Any, Callable

import tiktoken_tpu_ext

from tiktoken_tpu.core import Encoding

_lock = threading.RLock()

# Singleton cache of constructed encodings, keyed by name. core.Encoding's
# pickle support introspects this to pickle registered encodings by name.
ENCODINGS: dict[str, Encoding] = {}

_constructors: dict[str, Callable[[], dict[str, Any]]] | None = None


@functools.lru_cache
def _available_plugin_modules() -> tuple[str, ...]:
    # tiktoken_tpu_ext is a namespace package: any installed distribution can
    # contribute encodings by shipping a module inside it.
    prefix = tiktoken_tpu_ext.__name__ + "."
    return tuple(
        info.name for info in pkgutil.iter_modules(tiktoken_tpu_ext.__path__, prefix)
    )


def _discover_constructors() -> dict[str, Callable[[], dict[str, Any]]]:
    found: dict[str, Callable[[], dict[str, Any]]] = {}
    for mod_name in _available_plugin_modules():
        mod = importlib.import_module(mod_name)
        try:
            constructors = mod.ENCODING_CONSTRUCTORS
        except AttributeError as e:
            raise ValueError(
                f"tiktoken_tpu plugin {mod_name} does not define ENCODING_CONSTRUCTORS"
            ) from e
        for enc_name, constructor in constructors.items():
            if enc_name in found:
                raise ValueError(
                    f"Duplicate encoding name {enc_name} in tiktoken_tpu plugin {mod_name}"
                )
            found[enc_name] = constructor
    return found


def _get_constructors() -> dict[str, Callable[[], dict[str, Any]]]:
    # Caller must hold _lock. On failure, leave the registry unpopulated so a
    # later call can retry discovery.
    global _constructors
    if _constructors is None:
        _constructors = _discover_constructors()
    return _constructors


def get_encoding(encoding_name: str) -> Encoding:
    """Return the (cached) ``Encoding`` registered under ``encoding_name``."""
    if not isinstance(encoding_name, str):
        raise ValueError(
            f"Expected a string in get_encoding, got {type(encoding_name)}: {encoding_name!r}"
        )

    enc = ENCODINGS.get(encoding_name)
    if enc is not None:
        return enc

    with _lock:
        enc = ENCODINGS.get(encoding_name)
        if enc is not None:
            return enc

        constructors = _get_constructors()
        if encoding_name not in constructors:
            raise ValueError(
                f"Unknown encoding {encoding_name}.\n"
                f"Plugins found: {_available_plugin_modules()}"
            )

        enc = Encoding(**constructors[encoding_name]())
        ENCODINGS[encoding_name] = enc
        return enc


def list_encoding_names() -> list[str]:
    """Return the names of all registered encodings."""
    with _lock:
        return list(_get_constructors())
