"""Command-line decoder: the reference CLI's behavior (pdmp3.c:2540-2589)
with selectable backends.

    python -m pdmp3_tpu.cli [options] file.mp3 [file2.mp3 ...]

Decodes each file to <file>.raw (S16LE interleaved) or stdout with "-",
exactly like the reference built with OUTPUT_RAW.  A leading /dev/dsp*
argument is accepted (and ignored) for reference-CLI compatibility.
"""
from __future__ import annotations

import argparse
import sys


def _decode(data: bytes, backend: str, lsf: bool = False,
            free_format: bool = False, id3: bool = False,
            layers12: bool = False, crc_check: bool = False) -> bytes:
    if backend == "native":
        from .host import (PROFILE_CRC, PROFILE_FREE_FORMAT, PROFILE_ID3,
                           PROFILE_L12, PROFILE_LSF, native_decode_file)
        prof = (PROFILE_LSF if lsf else 0) \
            | (PROFILE_FREE_FORMAT if free_format else 0) \
            | (PROFILE_ID3 if id3 else 0) \
            | (PROFILE_L12 if layers12 else 0) \
            | (PROFILE_CRC if crc_check else 0)
        return native_decode_file(data, profile=prof)
    if backend == "oracle":
        from .api import decode_file
        return decode_file(data, lsf=lsf, free_format=free_format,
                           id3=id3, layers12=layers12, crc_check=crc_check)
    if backend in ("tpu", "tpu-exact", "tpu-fast"):
        from .api import decode_file
        from .models.decoder import JaxDSP
        exact = backend != "tpu-fast"
        if exact:
            import jax
            jax.config.update("jax_enable_x64", True)
        return decode_file(data, dsp=JaxDSP(exact=exact), lsf=lsf,
                           free_format=free_format, id3=id3,
                           layers12=layers12, crc_check=crc_check)
    if backend == "batch":
        from .runtime import decode_files_batched
        if lsf or free_format or id3 or layers12:
            raise SystemExit("--lsf/--free-format/--id3/--layers12: use a "
                             "streaming backend (native/oracle/tpu)")
        return decode_files_batched([data])[0]
    raise SystemExit(f"unknown backend {backend!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="pdmp3", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("files", nargs="+",
                    help="MP3 files ('-' = stdin); a leading /dev/dsp* "
                         "argument is ignored (reference-CLI compat)")
    ap.add_argument("--backend", default="native",
                    choices=["native", "oracle", "tpu", "tpu-exact",
                             "tpu-fast", "batch"],
                    help="decode engine (default: native C++, bit-exact)")
    ap.add_argument("-o", "--output", default=None,
                    help="output path (single input only; default "
                         "<file>.raw, '-' = stdout)")
    ap.add_argument("--lsf", action="store_true",
                    help="also accept MPEG-2/2.5 (13818-3 LSF) streams "
                         "(beyond the reference)")
    ap.add_argument("--free-format", action="store_true",
                    help="accept free-format bitrate streams (frame "
                         "size deduced from the sync spacing)")
    ap.add_argument("--id3", action="store_true",
                    help="skip ID3v2 tags explicitly (tags larger than "
                         "the 16 KiB input ring would otherwise kill "
                         "the stream, as in the reference)")
    ap.add_argument("--layers12", action="store_true",
                    help="also decode MPEG Layer I/II frames (beyond "
                         "the reference, which rejects layer != 3)")
    ap.add_argument("--crc", action="store_true",
                    help="verify the ISO CRC-16 of protected frames and "
                         "skip failures (the reference discards CRC "
                         "bytes unchecked)")
    ap.add_argument("--info", action="store_true",
                    help="print stream metadata as JSON (Xing/Info/"
                         "VBRI/LAME tags, duration, gapless bounds) "
                         "and exit without decoding")
    ap.add_argument("--seek", type=float, default=None, metavar="SEC",
                    help="decode starting at SEC (bit-exact vs the "
                         "same window of a full decode)")
    ap.add_argument("--duration", type=float, default=None, metavar="SEC",
                    help="with --seek: decode only SEC seconds")
    ap.add_argument("--gapless", action="store_true",
                    help="apply LAME encoder delay/padding trim "
                         "(exact original sample count)")
    ap.add_argument("--wav", action="store_true",
                    help="write a RIFF/WAVE container instead of raw "
                         "S16LE (output defaults to <file>.wav)")
    args = ap.parse_args(argv)

    files = list(args.files)
    if files and files[0].startswith("/dev/dsp"):
        files = files[1:]
    if args.output and len(files) != 1:
        ap.error("-o requires exactly one input file")

    for path in files:
        data = sys.stdin.buffer.read() if path == "-" else \
            open(path, "rb").read()
        if args.info:
            _print_info(path, data)
            continue
        if args.seek is not None or args.gapless:
            from . import metadata as M
            dec = lambda b: _decode(b, args.backend, args.lsf,    # noqa: E731
                                    args.free_format, args.id3,
                                    args.layers12, args.crc)
            if args.seek is not None:
                pcm, sinfo = M.decode_file_seek(data, args.seek,
                                                args.duration, decode=dec)
            else:
                pcm, sinfo = M.decode_file_gapless(data, decode=dec)
            rate, nch = sinfo.sample_rate, sinfo.channels
        else:
            pcm = _decode(data, args.backend, args.lsf, args.free_format,
                          args.id3, args.layers12, args.crc)
            rate = nch = None
        ext = ".wav" if args.wav else ".raw"
        out = args.output or (path + ext if path != "-" else "-")
        if args.wav:
            if rate is None:
                from . import metadata as M
                sinfo = M.parse_stream_info(data)
                if sinfo is None:
                    raise SystemExit(f"{path}: no MPEG frame sync found")
                rate, nch = sinfo.sample_rate, sinfo.channels
            from .utils.wav import wav_bytes
            pcm = wav_bytes(pcm, rate, nch)
        if out == "-":
            sys.stdout.buffer.write(pcm)
        else:
            with open(out, "wb") as f:
                f.write(pcm)
    return 0


def _print_info(path: str, data: bytes) -> None:
    import dataclasses
    import json

    from . import metadata as M
    info = M.parse_stream_info(data)
    if info is None:
        raise SystemExit(f"{path}: no MPEG frame sync found")
    d = dataclasses.asdict(info)
    d.pop("toc", None)                  # 100 raw bytes: not JSON-friendly
    d["duration_seconds"] = info.estimate_duration(len(data))
    d["total_samples"] = info.total_samples
    d["file"] = path
    print(json.dumps(d, indent=2))


if __name__ == "__main__":
    sys.exit(main())
