"""Round-11 media-tier vectorization evidence (apples-to-apples).

The r10 verdict flagged the vendored codecs' pure-Python inner loops
(dhash64's 64 slice-sums, PNG per-byte filter reconstruction, BMP/AVI
per-row de-padding) as the per-core bottleneck at real media volume.
Round 11 vectorized them with numpy. This script times the FULL old
decode functions (imported from a git worktree pinned at the r10
verdict commit — same entry points, same payloads) against the FULL
shipped ones, asserts bit-identical outputs first, and writes
MEDIA_VEC_AB_R11.json with per-function speedups. No scope mismatch:
both arms include header parse, chunk walk, CRC and inflate where the
codec has them.

Usage:
    git worktree add /tmp/ab_r10 <r10-verdict-commit>
    python scripts/ab_media_numpy_r11.py [out_json]
Env: AB_TREE_OLD overrides the old-code worktree path.
"""

from __future__ import annotations

import importlib
import json
import os
import random
import sys
import time

NEW_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_ROOT = os.environ.get("AB_TREE_OLD", "/tmp/ab_r10")
PKG = "website_traffic_etl_gcp_spark"
REPEATS = 7


def _load(root: str):
    """Import (media_minimal, multimodal) from ``root``, isolated."""
    for mod in [m for m in sys.modules if m.startswith(PKG)]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p not in (NEW_ROOT, OLD_ROOT)]
    sys.path.insert(0, root)
    media = importlib.import_module(f"{PKG}.sources.media_minimal")
    mm = importlib.import_module(f"{PKG}.operators.multimodal")
    return media, mm


def _time_once(fn, args_list):
    t0 = time.perf_counter()
    for a in args_list:
        fn(*a)
    return time.perf_counter() - t0


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        NEW_ROOT, "MEDIA_VEC_AB_R11.json"
    )
    if not os.path.isdir(os.path.join(OLD_ROOT, PKG)):
        raise SystemExit(
            f"old worktree missing at {OLD_ROOT}: "
            "git worktree add /tmp/ab_r10 <r10-verdict-commit>"
        )
    rng = random.Random(11)
    w, h = 512, 512
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    pix_payloads = [
        (bytes(rng.randrange(256) for _ in range(w * h)),) for _ in range(5)
    ]

    # build payloads with the NEW encoders (byte formats are identical
    # across the two commits — the old decoders must accept them, which
    # the equality asserts below prove)
    media_new, mm_new = _load(NEW_ROOT)
    bmp = media_new.encode_bmp(w, h, pix)
    png = media_new.encode_png(w, h, pix)
    avi = media_new.encode_avi(w, h, [pix] * 4)

    report = {
        "repeats": REPEATS,
        "payloads": {"grid": f"{w}x{h}", "avi_frames": 4},
        "old_code": f"worktree {OLD_ROOT} (r10 verdict commit)",
        "design": "full-function A/B: same entry points, same payloads, "
        "best-of-N; outputs asserted bit-identical first",
    }

    cases = {
        "dhash64": (lambda mod: mod[1].dhash64, pix_payloads),
        "decode_bmp": (lambda mod: mod[0].decode_bmp, [(bmp,)] * 5),
        "decode_png": (lambda mod: mod[0].decode_png, [(png,)] * 3),
        "decode_avi": (lambda mod: mod[0].decode_avi, [(avi,)] * 3),
    }

    # correctness parity first (old vs new outputs, all payloads)
    media_old, mm_old = _load(OLD_ROOT)
    old_out = {
        name: [pick((media_old, mm_old))(*a) for a in args]
        for name, (pick, args) in cases.items()
    }
    media_new, mm_new = _load(NEW_ROOT)
    for name, (pick, args) in cases.items():
        new_out = [pick((media_new, mm_new))(*a) for a in args]
        assert new_out == old_out[name], f"{name} output drifted"

    # timing: TRULY alternate arms (old pass, new pass, old pass, ...)
    # so a transient load spike hits both arms; best-of-REPEATS per arm
    for name, (pick, args) in cases.items():
        t_old = t_new = None
        for _ in range(REPEATS):
            fn_old = pick(_load(OLD_ROOT))
            dt = _time_once(fn_old, args)
            t_old = dt if t_old is None else min(t_old, dt)
            fn_new = pick(_load(NEW_ROOT))
            dt = _time_once(fn_new, args)
            t_new = dt if t_new is None else min(t_new, dt)
        report[name] = {
            "old_sec": round(t_old, 4),
            "new_sec": round(t_new, 4),
            "speedup": round(t_old / t_new, 1),
        }

    report["decode_png"]["note"] = (
        "both arms include chunk walk + CRC + inflate; Average/Paeth "
        "rows (2 of 5) keep a sequential loop (left-neighbor data "
        "dependence), bounding the PNG win"
    )
    report["pass_5x"] = report["dhash64"]["speedup"] >= 5.0
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
