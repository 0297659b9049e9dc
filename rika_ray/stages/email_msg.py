"""RFC 5322 / MIME email extraction — the Tika RFC822Parser and
MboxParser analogues (the reference inherits both via the Tika jar,
``/root/reference/lib/rika/tika_loader.rb:12-26``).

Built on the Python stdlib ``email`` package (public API), which owns
header unfolding, RFC 2047 encoded-word decoding, charset handling, and
base64 / quoted-printable content-transfer-encoding decode. This module
only flattens the MIME tree into renderable leaves; the per-leaf routing
(HTML bodies through the boilerplate extractor, binary attachments
through the magic-byte dispatch) is driven by ``ExtractStage`` like the
archive kernels, so an email with a PDF attachment extracts the PDF text
through the exact same code path as a standalone PDF.

multipart/alternative policy: prefer the ``text/plain`` member, else the
first member — one rendering per alternative group, never both (the MIME
convention is that alternatives carry the same content; emitting both
would double-count the body in downstream dedup / token statistics).
"""

from __future__ import annotations

import email
import email.policy
from email.message import Message


class EmailParseError(Exception):
    pass


# policy.default gives the modern EmailMessage API: unfolded headers,
# decoded encoded-words, get_content() with charset + CTE handling
_POLICY = email.policy.default

# metadata surface modeled on Tika's RFC822Parser keys
_HEADER_KEYS = (
    ("From", "Message:From"),
    ("To", "Message:To"),
    ("Cc", "Message:Cc"),
    ("Message-ID", "Message:Message-ID"),
    ("Date", "Message:Date"),
)


def parse_message(data: bytes) -> Message:
    try:
        msg = email.message_from_bytes(data, policy=_POLICY)
    except Exception as e:  # the email package can raise on mangled input
        raise EmailParseError(f"unparseable message: {e}") from None
    if not msg.keys():
        raise EmailParseError("no RFC 5322 headers")
    return msg


def message_metadata(msg: Message) -> dict[str, str]:
    meta: dict[str, str] = {}
    for hdr, key in _HEADER_KEYS:
        try:
            v = msg.get(hdr)
        except Exception:  # defective header survives as absent
            v = None
        if v:
            meta[key] = str(v)
    subject = meta_subject(msg)
    if subject:
        meta["dc:title"] = subject
    if "Message:From" in meta:
        meta["dc:creator"] = meta["Message:From"]
    return meta


def meta_subject(msg: Message) -> str | None:
    try:
        s = msg.get("Subject")
    except Exception:
        return None
    return str(s) if s else None


def message_leaves(msg: Message) -> list[tuple[str | None, str, str | bytes]]:
    """Flatten the MIME tree to renderable leaves in document order:
    ``(filename, content_type, payload)`` where payload is decoded ``str``
    for text/* leaves (charset + CTE handled by the email package) and raw
    ``bytes`` for everything else (routed by the caller's dispatch)."""
    out: list[tuple[str | None, str, str | bytes]] = []
    _walk(msg, out, depth=0)
    return out


_MAX_MIME_DEPTH = 8  # MIME-bomb guard: deeper nesting is never legitimate


def _walk(part: Message, out: list, depth: int) -> None:
    if depth > _MAX_MIME_DEPTH:
        return
    if part.is_multipart():
        children = part.get_payload()
        if not isinstance(children, list):
            return
        if part.get_content_subtype() == "alternative":
            chosen = next(
                (c for c in children if c.get_content_type() == "text/plain"),
                children[0] if children else None,
            )
            if chosen is not None:
                _walk(chosen, out, depth + 1)
        else:
            for c in children:
                _walk(c, out, depth + 1)
        return
    ctype = part.get_content_type()
    filename = part.get_filename()
    if ctype == "message/rfc822":
        # forwarded message: recurse into the embedded message's tree
        inner = part.get_payload()
        if isinstance(inner, list):
            for c in inner:
                _walk(c, out, depth + 1)
        return
    if ctype.startswith("text/"):
        try:
            payload = part.get_content()
        except Exception:
            raw = part.get_payload(decode=True) or b""
            payload = raw.decode("utf-8", errors="replace")
        out.append((filename, ctype, payload))
    else:
        out.append((filename, ctype, part.get_payload(decode=True) or b""))


# ---------------------------------------------------------------------------
# mbox

# The mbox postmark: "From " at line start followed by an envelope
# sender and a ctime-style date ("Mon Jan 12 10:00:00 2026"). The date
# shape is REQUIRED at split points — a body line that merely starts
# with "From " (prose, unstuffed quoting) must not split the mailbox.
import re as _re

_POSTMARK = b"From "
_POSTMARK_RE = _re.compile(
    rb"From \S+ +[A-Z][a-z]{2} [A-Z][a-z]{2} [ \d]\d"
    rb" \d\d:\d\d:\d\d \d{4}\r?\n"
)


def split_mbox(data: bytes) -> list[bytes]:
    """Split an mbox file into per-message byte blobs (postmark lines
    dropped). Tika's MboxParser treats each message as an embedded
    document; the caller parses each blob through the RFC822 path."""
    if not data.startswith(_POSTMARK):
        raise EmailParseError("not an mbox: missing leading postmark")
    messages: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip the postmark line itself
        eol = data.find(b"\n", pos)
        body_start = n if eol == -1 else eol + 1
        # the next message starts at the next line-anchored POSTMARK
        # (validated against the full shape, not just "\nFrom ")
        nxt = data.find(b"\nFrom ", body_start)
        while nxt != -1 and not _POSTMARK_RE.match(data, nxt + 1):
            nxt = data.find(b"\nFrom ", nxt + 1)
        body_end = n if nxt == -1 else nxt + 1
        blob = data[body_start:body_end]
        # drop the ONE blank separator line before the next postmark — it
        # is mailbox framing; any further trailing blank lines are genuine
        # message body and must survive the round trip
        if blob.endswith(b"\n\n"):
            blob = blob[:-1]
        messages.append(blob)
        pos = body_end
    return messages
