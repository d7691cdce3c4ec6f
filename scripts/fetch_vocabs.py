"""Provision the vocabulary cache for every shipped encoding.

The build environment has no network egress, so the golden-value suite
(tests/test_golden.py) auto-skips there. On any machine WITH network (or
with a pre-populated cache mounted at $TIKTOKEN_CACHE_DIR), run

    python scripts/fetch_vocabs.py

once; every ``get_encoding`` name then constructs offline and the full
golden + device-golden suites run for real:

    python -m pytest tests/test_golden.py -v

Each download is sha256-verified and atomically cached by the loader
(tiktoken_tpu/load.py), so a partial run is safe to re-run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import tiktoken_tpu

    failures = []
    for name in tiktoken_tpu.list_encoding_names():
        try:
            enc = tiktoken_tpu.get_encoding(name)
            report = enc.device_engine.vocab_report
            print(f"{name}: ok — n_vocab={enc.n_vocab} {report}")
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"{name}: FAILED ({type(e).__name__}: {e})")
    if failures:
        print(f"\n{len(failures)} encodings not provisioned: {failures}")
        print("(no network? mount a cache at $TIKTOKEN_CACHE_DIR instead)")
        return 1
    print("\nall vocabularies cached; run: python -m pytest tests/test_golden.py -v")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
