"""Generate (and verify) the tiny H.264 fixture for the gated ffmpeg
decode path — run this on any host that HAS ffmpeg; this container does
not, which is why `test_ffmpeg_interframe_decode_when_present` skips
here. See docs/FFMPEG.md for the recorded expected checksums.

What it does:
1. regenerates the EXACT 5-frame 48x32 grayscale source the test uses
   (numpy default_rng seed 7 — deterministic everywhere);
2. encodes it losslessly (libx264, qp 0) into a fragmented MP4 at
   tests/fixtures/tiny_h264.mp4;
3. decodes it back through the engine's ffmpeg pipe
   (`decode_video_frames` with SPARK_GRAFT_FFMPEG=1) and asserts each
   decoded frame's sha256 equals the source frame's — lossless encode
   means decoded == source, so the EXPECTED checksums are computable
   without ffmpeg and are pinned in docs/FFMPEG.md;
4. prints one JSON line with the fixture path + per-frame checksums,
   suitable for pasting into CI logs.

Usage:  SPARK_GRAFT_FFMPEG=1 python scripts/ffmpeg_fixture.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

EXPECTED_SHA256 = [
    "452746e430a199ec93148feb7cb4b5e3303e49671f9e113642df61d4cbbc1aab",
    "f99e42c92289534585a1998010714171712bc4699a1d766c2bca5c8fa8201734",
    "057240ebcf5302dbec44131205cb8482494096148dfbcf069a4967d7b0b84d2e",
    "7b8cd00aaf40b7b49fe50edc14a8d76482c1d0c8fd9c3ea05724650d2c1c4ce6",
    "195cf8a786b9303607d35bceb05c701d1392d93752f7a4534e873a508fd86bf7",
]


def main() -> None:
    import numpy as np

    from etl_demo_spark.io.video import decode_video_frames, y4m_bytes

    if not shutil.which("ffmpeg"):
        print(json.dumps({"error": "ffmpeg not installed on this host"}))
        sys.exit(2)
    os.environ["SPARK_GRAFT_FFMPEG"] = "1"

    rng = np.random.default_rng(7)
    src = [rng.integers(0, 256, (32, 48), dtype=np.uint8) for _ in range(5)]
    for i, f in enumerate(src):
        got = hashlib.sha256(f.tobytes()).hexdigest()
        assert got == EXPECTED_SHA256[i], (
            f"source frame {i} drifted: numpy default_rng(7) no longer "
            f"reproduces the recorded stream ({got})"
        )
    raw = y4m_bytes(src)
    enc = subprocess.run(
        [
            "ffmpeg", "-v", "error", "-i", "pipe:0", "-c:v", "libx264",
            "-preset", "ultrafast", "-qp", "0", "-f", "mp4",
            "-movflags", "frag_keyframe+empty_moov", "pipe:1",
        ],
        input=raw, capture_output=True, check=True,
    ).stdout

    out = REPO / "tests" / "fixtures" / "tiny_h264.mp4"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(enc)

    frames = decode_video_frames(enc)
    assert frames is not None and len(frames) == 5, "decode failed"
    decoded = [hashlib.sha256(f.tobytes()).hexdigest() for f in frames]
    assert decoded == EXPECTED_SHA256, (
        "lossless round-trip violated: decoded checksums "
        f"{decoded} != expected {EXPECTED_SHA256}"
    )
    print(
        json.dumps(
            {
                "fixture": str(out),
                "bytes": len(enc),
                "frames": 5,
                "sha256": decoded,
                "status": "decoded == source, lossless round-trip verified",
            }
        )
    )


if __name__ == "__main__":
    main()
