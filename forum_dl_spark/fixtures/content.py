"""Shared deterministic interleaved text+media HTML renderer for fixtures."""

from __future__ import annotations

import hashlib

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu ember quartz raven lattice orbit prism"
).split()


def h64(seed: int, key: str) -> int:
    return int.from_bytes(hashlib.md5(f"{seed}:{key}".encode()).digest()[:8], "big")


def words(seed: int, key: str, n: int) -> str:
    h = h64(seed, f"text:{key}")
    return " ".join(_WORDS[(h >> (5 * k % 59)) % len(_WORDS)] for k in range(n))


def interleaved_html(seed: int, post_id: int) -> str:
    """Post HTML with deterministically interleaved text and media embeds
    (the north-rule payload; media mix exercises every branch of the
    reference's embed extractor, forum_dl/extractors/common.py:494-563)."""
    h = h64(seed, f"cooked:{post_id}")
    parts = [f"<p>{words(seed, f'{post_id}:a', 6 + h % 7)}</p>"]
    if h % 3 == 0:
        parts.append(f'<p><img src="/img/{post_id}_0.png" alt=""></p>')
        parts.append(f"<p>{words(seed, f'{post_id}:b', 5)}</p>")
    if h % 5 == 0:
        parts.append(f'<img src="/img/{post_id}_1.png">')
    if h % 7 == 0:
        parts.append(f'<object data="/obj/{post_id}.swf"></object>')
    if h % 11 == 0:
        parts.append(
            f'<audio controls><source src="/a/{post_id}.ogg">'
            f'<source src="/a/{post_id}.mp3"></audio>'
        )
    if h % 13 == 0:
        parts.append(
            f'<svg viewBox="0 0 8 8"><circle cx="{h % 8}" cy="4" r="2"></circle></svg>'
        )
    if h % 17 == 0:
        # reference selects <video> but has no handler branch
        # (common.py:494-563) → must yield nothing
        parts.append(f'<video src="/v/{post_id}.mp4"></video>')
    if h % 19 == 0:
        # SHARED across posts: exercises cross-post file-download dedup
        # (reference caches by URL, forum_dl/session.py:105-111 via
        # download_file's should_cache=True, extractors/common.py:396-401)
        parts.append('<img src="/img/shared_banner.png">')
    if h % 23 == 0:
        # inline data-URI media: decoded at export, never fetched
        # (reference write_file regex branch, writers/common.py:162-167)
        from base64 import b64encode

        _, payload = media_bytes(seed, f"{post_id}_inline.png")
        parts.append(
            f'<img src="data:image/png;base64,{b64encode(payload).decode()}">'
        )
    parts.append(f"<p>{words(seed, f'{post_id}:z', 4 + h % 5)}</p>")
    return "".join(parts)


def media_bytes(seed: int, path: str) -> tuple[str, bytes]:
    """Deterministic fake media payload + content type for a media URL path."""
    ext = path.rsplit(".", 1)[-1]
    ctype = {
        "png": "image/png",
        "jpg": "image/jpeg",
        "ogg": "audio/ogg",
        "mp3": "audio/mpeg",
        "swf": "application/x-shockwave-flash",
        "mp4": "video/mp4",
        "css": "text/css",
    }.get(ext, "application/octet-stream")
    h = hashlib.md5(f"{seed}:media:{path}".encode()).digest()
    return ctype, h * (2 + h[0] % 6)
