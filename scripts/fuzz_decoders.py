"""r14 (VERDICT r13 #7): deep decoder mutation fuzz over the FULL codec
roster — netpbm, BMP(8bpp palette incl.), PNG, JPEG (444 + 420/restart),
WAV, ADPCM-WAV, DIB-AVI, MJPEG-AVI — >=10k seeded mutations per payload.
Contract: every decode returns None or data, NEVER raises. The 40-trial
version of this harness lives in tests/test_ml_and_seqs.py (it found and
fixed two crash paths in r13: netpbm, WAV); this script is the deep sweep.

r15 adds the two genomics containers the roster missed (the review that
hardened them found an infinite loop on corrupt BAM block sizes): BAM and
BigWig decode under a DIFFERENT contract — these are file-level readers
whose documented behavior is data OR ValueError (one corrupt FILE fails
its own task; contrast the multimodal per-document decoders, where one
corrupt payload must not kill the mapInPandas batch, hence None). The
fuzz therefore asserts: returns or raises ValueError, never hangs, never
any other exception type.

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

    # --- r15: genomics containers (value-error contract, see docstring) ---
    import gzip
    import io
    import os
    import tempfile

    from pyranges_1_x_spark.sources.bam_native import decode_bam_bytes, write_bam
    from pyranges_1_x_spark.sources.bigwig_native import (
        _chrom_map,
        _read_header,
        _rtree_leaves,
        decode_block,
        write_bigwig,
    )

    with tempfile.TemporaryDirectory() as td:
        bam_path = os.path.join(td, "f.bam")
        write_bam(
            bam_path,
            [(f"read{i}", 0 if i % 3 else 16, "chr1", 10 * i, 60,
              "10M2D5M", "A" * 15, "I" * 15) for i in range(12)],
            {"chr1": 10000, "chr2": 10000},
        )
        bam_raw = gzip.open(bam_path, "rb").read()
        bw_path = os.path.join(td, "f.bw")
        write_bigwig(
            bw_path,
            [("chr1", 10 * i, 10 * i + 10, float(i)) for i in range(300)],
            {"chr1": 10000},
            items_per_block=64,
        )
        bw_raw = open(bw_path, "rb").read()

    def bam_dec(buf: bytes):
        return decode_bam_bytes(buf, full=True)

    def bw_dec(buf: bytes):
        # Full driver-side walk + every block decode, as read_bigwig_native
        # would: header -> chrom tree -> R-tree leaves -> decode_block.
        fh = io.BytesIO(buf)
        hdr = _read_header(fh)
        chroms = _chrom_map(fh, hdr["chrom_tree_off"])
        out = []
        for off, size in _rtree_leaves(fh, hdr["index_off"]):
            fh.seek(off)
            raw2 = fh.read(size)
            if hdr["uncompress_buf"]:
                import zlib

                raw2 = zlib.decompress(raw2)
            out.extend(decode_block(raw2, chroms))
        return out

    #: (name, payload, decoder, allowed exception types). The genomics
    #: readers allow ValueError + the codec-boundary errors their
    #: docstrings name (zlib/EOF for a corrupt compression stream, struct
    #: at the exact EOF boundary is NOT allowed — that is what the r15
    #: hardening fixed). RecursionError is NOT allowed: the bigwig tree
    #: walkers are iterative with a visited-offset guard (r15 review find
    #: — cycles and duplicated child offsets are corruption, rejected as
    #: ValueError, never deep recursion or exponential re-walks).
    import zlib as _zlib

    genomics = [
        ("bam", bam_raw, bam_dec, (ValueError, _zlib.error, EOFError)),
        ("bigwig", bw_raw, bw_dec, (ValueError, _zlib.error, EOFError)),
    ]
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
    for name, payload, dec, allowed in genomics:
        assert len(dec(payload)) > 0, f"{name}: clean payload must decode"
        n = len(payload)
        for trial in range(trials):
            mode = trial % 5
            buf = bytearray(payload)
            if mode == 0:
                for pos in rng.integers(0, n, size=int(rng.integers(1, 9))):
                    buf[pos] ^= int(rng.integers(1, 256))
            elif mode == 1:
                buf = buf[: int(rng.integers(0, n))]
            elif mode == 2:
                pos = int(rng.integers(0, max(n - 4, 1)))
                buf[pos : pos + 4] = b"\xff\xff\xff\x7f"
            elif mode == 3:
                cut = int(rng.integers(0, n))
                buf = bytearray(payload[:cut] + payload[: int(rng.integers(0, n))])
            else:
                pos = int(rng.integers(0, n))
                ln = int(rng.integers(1, 64))
                buf[pos : pos + ln] = b"\x00" * min(ln, n - pos)
            try:
                dec(bytes(buf))
            except allowed:
                pass
            except Exception:  # noqa: BLE001
                crashes += 1
                print(f"CRASH {name} trial={trial} mode={mode} len={len(buf)}")
                traceback.print_exc()
                if crashes >= 5:
                    return 1
        print(f"{name}: {trials} mutations clean "
              f"(contract: data or {'/'.join(a.__name__ for a in allowed)})",
              flush=True)

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
