"""CLI entry point: `python main.py --config <yaml>`.

Parity with the reference entry (reference: main.py:16-23), minus the
exception-swallowing try/except — failures surface with full tracebacks.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

# persistent compilation cache (also wired in bench.py): repeat runs skip
# the multi-minute first-window compile, including over the remote-compile
# TPU tunnel
jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).resolve().parent / ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.vid2vid import vid2vid


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU-native ControlAnimate vid2vid")
    parser.add_argument("--config", type=str, required=True, help="path to a run yaml")
    parser.add_argument("--max-windows", type=int, default=None,
                        help="stop after N windows (debugging)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu); needed where a "
                             "site hook pre-registers an accelerator platform "
                             "and the JAX_PLATFORMS env var is ignored")
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # graceful Ctrl-C: the first SIGINT requests a cooperative stop at the
    # next window boundary (pending emits flush, a resumable checkpoint is
    # saved — rerun with `resume: 1` to continue); a second SIGINT falls
    # through to the default KeyboardInterrupt
    import signal

    stop = {"requested": False}
    prev_handler = signal.getsignal(signal.SIGINT)

    def _on_sigint(signum, frame):
        if stop["requested"]:
            signal.signal(signal.SIGINT, prev_handler)
            raise KeyboardInterrupt
        stop["requested"] = True
        # os.write, not print: the handler can fire while the main thread is
        # mid-write to the same buffered stream, and a reentrant buffered
        # write raises RuntimeError — killing the run the handler exists to
        # stop gracefully
        import os

        os.write(
            2,
            b"\nstopping at the next window boundary (checkpoint will be "
            b"saved; Ctrl-C again to abort immediately)\n",
        )

    signal.signal(signal.SIGINT, _on_sigint)
    summary = vid2vid(
        args.config, max_windows=args.max_windows,
        should_stop=lambda: stop["requested"],
    )
    print(summary)


if __name__ == "__main__":
    main()
