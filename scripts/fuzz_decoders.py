"""r14 (VERDICT r13 #7): deep decoder mutation fuzz over the FULL codec
roster — netpbm, BMP(8bpp palette incl.), PNG, JPEG (444 + 420/restart),
WAV, ADPCM-WAV, DIB-AVI, MJPEG-AVI — >=10k seeded mutations per payload.
Contract: every decode returns None or data, NEVER raises. The 40-trial
version of this harness lives in tests/test_ml_and_seqs.py (it found and
fixed two crash paths in r13: netpbm, WAV); this script is the deep sweep.

Usage: python scripts/fuzz_decoders.py [trials_per_payload=10000]
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, ".")


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    import numpy as np

    from pyranges_1_x_spark.ml.jpeg import decode_jpeg, encode_jpeg
    from pyranges_1_x_spark.ml.multimodal import (
        decode_adpcm_wav,
        decode_avi,
        decode_bmp,
        decode_image,
        decode_png,
        decode_wav,
        encode_adpcm_wav,
        encode_avi,
        encode_bmp,
        encode_netpbm,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(20260816)
    img = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
    sig = (rng.standard_normal(800) * 8000).astype(np.int16)
    frames = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    payloads = [
        ("netpbm", encode_netpbm(img), decode_image),
        ("bmp", encode_bmp(img), decode_bmp),
        ("png", encode_png(img), decode_png),
        ("jpeg444", encode_jpeg(img), decode_jpeg),
        ("jpeg420r", encode_jpeg(gray, subsampling="420", restart_interval=1),
         decode_jpeg),
        ("wav", encode_wav(sig), decode_wav),
        ("adpcm", encode_adpcm_wav(sig), decode_adpcm_wav),
        ("avi-dib", encode_avi(frames), decode_avi),
        ("avi-mjpg", encode_avi(frames, codec="MJPG"), decode_avi),
    ]
    crashes = 0
    for name, payload, dec in payloads:
        assert dec(payload) is not None, f"{name}: clean payload must decode"
        n = len(payload)
        for trial in range(trials):
            mode = trial % 5
            buf = bytearray(payload)
            if mode == 0:  # flip 1-8 bytes anywhere
                for pos in rng.integers(0, n, size=int(rng.integers(1, 9))):
                    buf[pos] ^= int(rng.integers(1, 256))
            elif mode == 1:  # truncate anywhere
                buf = buf[: int(rng.integers(0, n))]
            elif mode == 2:  # corrupt a 4-byte window with a huge length
                pos = int(rng.integers(0, max(n - 4, 1)))
                buf[pos : pos + 4] = b"\xff\xff\xff\x7f"
            elif mode == 3:  # splice halves of two different payloads
                other = payloads[(trial // 5) % len(payloads)][1]
                cut = int(rng.integers(0, n))
                buf = bytearray(payload[:cut] + other[int(rng.integers(0, len(other))):])
            else:  # zero a random run
                pos = int(rng.integers(0, n))
                ln = int(rng.integers(1, 64))
                buf[pos : pos + ln] = b"\x00" * min(ln, n - pos)
            for d in (dec, decode_image):
                try:
                    d(bytes(buf))
                except Exception:  # noqa: BLE001
                    crashes += 1
                    print(f"CRASH {name} trial={trial} mode={mode} "
                          f"decoder={d.__name__} len={len(buf)}")
                    traceback.print_exc()
                    if crashes >= 5:
                        return 1
        print(f"{name}: {trials} mutations clean", flush=True)
    print("ALL CLEAN" if crashes == 0 else f"{crashes} CRASHES")
    return 1 if crashes else 0


if __name__ == "__main__":
    raise SystemExit(main())
