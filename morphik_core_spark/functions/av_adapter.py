"""Declared external-decoder boundary for modern A/V codecs.

The engine decodes what pure Python can decode honestly: MJPEG/DIB AVI
video (functions/video.py), WAV/FLAC audio (functions/audio.py,
functions/flac.py), and probes MP4/MOV + MP3/Ogg metadata. H.264/HEVC/VP9
video and MP3/Vorbis/Opus PCM need a real codec library — an external
boundary, exactly as the reference's video path shells into
ffmpeg-backed tooling (reference core/parser/video/parse_video.py:91-280
uses cv2/ffmpeg under the hood) and its audio path ships bytes to an
external transcription service.

This module DECLARES that boundary as a worked, testable adapter instead
of leaving foreign codecs as bare per-row failures:

- The adapter is ffmpeg-SHAPED: it drives an injected ``runner`` with
  ffprobe/ffmpeg-style argv + stdin-bytes -> stdout-bytes. A deployment
  passes ``subprocess``-backed runners; tests pass fakes. Nothing here
  imports or requires ffmpeg itself.
- Decoded frames/PCM re-enter the SAME row-level-failure mapInPandas
  contract the built-in decoders use (operators/multimodal.py): a payload
  the adapter cannot decode fails its own row, never the stage.
- Video decoder contract: ``decode(payload, sample_rate) -> (VideoMeta,
  iterator of (frame_idx, frame_ts, np.ndarray | Exception))`` — a frame
  that fails decoding yields its Exception in place, so one corrupt
  frame costs one row while the rest of the video still decodes.
- One decoder instance per Python worker (the operators construct it
  inside mapInPandas), so a real deployment amortizes process startup
  via the runner (e.g. a long-lived ffmpeg service or a pool).

Scale notes: frames stream through ``fps=`` sampling INSIDE the adapter
invocation — the full-rate video is never materialized; at 100 TB the
payload column stays executor-side and the decode is a pure map.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import numpy as np

__all__ = [
    "VideoMeta",
    "AudioMeta",
    "ExternalDecoderError",
    "builtin_video_decoder",
    "ffmpeg_video_decoder",
    "ffmpeg_audio_decoder",
    "subprocess_runner",
]

# runner contract: (argv, stdin_bytes) -> stdout_bytes; raise on failure
Runner = Callable[[list[str], bytes], bytes]


class ExternalDecoderError(RuntimeError):
    """The external decoder could not handle this payload (missing tool,
    unsupported codec, corrupt stream). Row-level: callers record the row
    failed and continue."""


@dataclass
class VideoMeta:
    codec: str
    width: int
    height: int
    fps: float
    n_frames: int


@dataclass
class AudioMeta:
    codec: str
    sample_rate: int
    channels: int
    duration_s: float


def subprocess_runner(timeout_s: float = 120.0) -> Runner:
    """Production runner: spawn the argv with the payload on stdin.
    Declared boundary — the tool must exist on the executor image."""

    def run(argv: list[str], stdin: bytes) -> bytes:
        import subprocess

        try:
            proc = subprocess.run(
                argv, input=stdin, capture_output=True, timeout=timeout_s, check=True
            )
        except FileNotFoundError as e:
            raise ExternalDecoderError(f"{argv[0]} not installed on executor") from e
        except Exception as e:  # noqa: BLE001 — adapter boundary
            raise ExternalDecoderError(f"{argv[0]} failed: {e}") from e
        return proc.stdout

    return run


def builtin_video_decoder():
    """The in-container real decoder: MJPEG/DIB AVI via functions/video.
    Same (payload, sample_rate) -> (meta, frames) contract as the ffmpeg
    adapter, so operators swap decoders without changing shape."""
    from morphik_core_spark.functions.video import decode_dib_frame, decode_jpeg, parse_avi

    def decode(payload: bytes, sample_rate: float) -> tuple[VideoMeta, Iterator[tuple[int, float, object]]]:
        fps, fw, fh, frames, codec = parse_avi(payload)
        meta = VideoMeta(codec=codec, width=fw, height=fh, fps=fps, n_frames=len(frames))
        step = max(1, int(round(fps / sample_rate)))

        def it():
            for idx in range(0, len(frames), step):
                # frame-level isolation lives HERE: a corrupt frame yields
                # its Exception and decoding continues with the next frame
                try:
                    px = decode_jpeg(frames[idx]) if codec == "MJPG" else decode_dib_frame(frames[idx], fw, fh)
                except Exception as exc:  # noqa: BLE001 — per-frame failure
                    yield idx, idx / fps, exc
                    continue
                yield idx, idx / fps, px

        return meta, it()

    return decode


def ffmpeg_video_decoder(runner: Optional[Runner] = None):
    """ffmpeg-shaped decoder for modern codecs (H.264/HEVC/VP9/AV1...).

    probe: ``ffprobe -v error -select_streams v:0 -show_entries
    stream=codec_name,width,height,avg_frame_rate,nb_frames -of json -``
    decode: ``ffmpeg -v error -i - -vf fps=<rate> -f rawvideo -pix_fmt
    rgb24 -`` — sampling happens inside ffmpeg, so only sampled frames
    cross the process boundary. Returns the same (meta, frames) contract
    as :func:`builtin_video_decoder`.
    """
    run = runner or subprocess_runner()

    def decode(payload: bytes, sample_rate: float) -> tuple[VideoMeta, Iterator[tuple[int, float, np.ndarray]]]:
        probe_out = run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0", "-show_entries",
             "stream=codec_name,width,height,avg_frame_rate,nb_frames", "-of", "json", "-"],
            payload,
        )
        try:
            stream = json.loads(probe_out)["streams"][0]
            num, _, den = str(stream.get("avg_frame_rate", "25/1")).partition("/")
            fps = float(num) / float(den or 1)
            w, h = int(stream["width"]), int(stream["height"])
            meta = VideoMeta(
                codec=str(stream.get("codec_name", "unknown")),
                width=w, height=h, fps=fps,
                n_frames=int(stream.get("nb_frames", 0) or 0),
            )
        except (KeyError, IndexError, ValueError, json.JSONDecodeError) as e:
            raise ExternalDecoderError(f"ffprobe output unparseable: {e}") from e
        raw = run(
            ["ffmpeg", "-v", "error", "-i", "-", "-vf", f"fps={sample_rate}",
             "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
            payload,
        )
        frame_bytes = w * h * 3
        if frame_bytes <= 0 or len(raw) % frame_bytes:
            raise ExternalDecoderError(
                f"rawvideo length {len(raw)} not a multiple of {w}x{h}x3"
            )
        n = len(raw) // frame_bytes
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3)
        step = max(1, int(round(fps / sample_rate)))

        def it():
            for k in range(n):
                # source-frame index of the k-th sampled frame
                yield k * step, k / sample_rate, arr[k]

        return meta, it()

    return decode


def ffmpeg_audio_decoder(runner: Optional[Runner] = None):
    """ffmpeg-shaped PCM decoder for perceptual audio codecs (MP3/Vorbis/
    Opus/AAC): probe then ``ffmpeg -i - -f s16le -ac <ch> -`` mono/stereo
    PCM. Returns (AudioMeta, np.int16 array of shape (n_samples,
    channels))."""
    run = runner or subprocess_runner()

    def decode(payload: bytes) -> tuple[AudioMeta, np.ndarray]:
        probe_out = run(
            ["ffprobe", "-v", "error", "-select_streams", "a:0", "-show_entries",
             "stream=codec_name,sample_rate,channels,duration", "-of", "json", "-"],
            payload,
        )
        try:
            stream = json.loads(probe_out)["streams"][0]
            meta = AudioMeta(
                codec=str(stream.get("codec_name", "unknown")),
                sample_rate=int(stream["sample_rate"]),
                channels=int(stream.get("channels", 1)),
                duration_s=float(stream.get("duration", 0.0) or 0.0),
            )
        except (KeyError, IndexError, ValueError, json.JSONDecodeError) as e:
            raise ExternalDecoderError(f"ffprobe output unparseable: {e}") from e
        raw = run(
            ["ffmpeg", "-v", "error", "-i", "-", "-f", "s16le",
             "-ar", str(meta.sample_rate), "-ac", str(meta.channels), "-"],
            payload,
        )
        width = 2 * meta.channels
        if len(raw) % width:
            raise ExternalDecoderError(f"PCM length {len(raw)} not a multiple of {width}")
        pcm = np.frombuffer(raw, dtype="<i2").reshape(-1, meta.channels)
        return meta, pcm

    return decode
