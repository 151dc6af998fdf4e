#!/usr/bin/env python
"""Loudly report whether the ffmpeg subprocess path has real coverage.

The modern-codec half of video parsing (H.264/HEVC/VP9) shells into
ffmpeg via functions/av_adapter.py; tests/test_av_adapter_subprocess.py
drives the REAL argv contract but skips wherever the binary is absent.
A silent skip hides a coverage hole, so this script exists to make the
status impossible to miss in session notes / CI logs (round-6 verdict,
"What's missing" #3). Exit code 0 either way — it reports, not gates.
"""

from __future__ import annotations

import shutil
import subprocess
import sys


def main() -> int:
    path = shutil.which("ffmpeg")
    probe = shutil.which("ffprobe")
    if not path:
        print("=" * 72)
        print("AV COVERAGE GAP: ffmpeg binary NOT FOUND on PATH.")
        print("tests/test_av_adapter_subprocess.py will SKIP its 3 integration")
        print("tests — the subprocess argv contract has NOT run in this")
        print("environment. MJPEG/DIB-AVI decode and MP4/MOV probe remain")
        print("covered by the pure-Python kernels; H.264/HEVC/VP9 decode is")
        print("exercised only against the recorded argv expectations.")
        print("Remedy: run the suite once on a host with ffmpeg installed.")
        print("=" * 72)
        return 0
    ver = subprocess.run([path, "-version"], capture_output=True, text=True, timeout=30)
    first = (ver.stdout or ver.stderr).splitlines()[0] if (ver.stdout or ver.stderr) else "?"
    print(f"ffmpeg present: {path} ({first})")
    print(f"ffprobe present: {probe or 'MISSING'}")
    print("tests/test_av_adapter_subprocess.py integration tests will RUN here.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
