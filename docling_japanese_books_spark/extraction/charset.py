"""Charset sniffing for crawled HTML — the Japanese-web decode problem.

The reference feeds files to Docling, which inherits charset handling;
our rebuilt extractor previously assumed UTF-8 and marked everything else
``decode_error``. Real Japanese web corpora are heavily Shift_JIS /
EUC-JP / ISO-2022-JP (the north rule's target content), so decoding is a
first-class extraction step, not an error path.

Deterministic WHATWG-inspired policy (documented subset, stdlib codecs
only):

1. BOM: UTF-8 / UTF-16 LE/BE BOMs win outright.
2. A ``<meta charset=...>`` or ``http-equiv Content-Type`` declaration in
   the first 1024 bytes (scanned on a latin-1 view — the prefix of every
   supported encoding is ASCII-compatible except UTF-16, which the BOM
   step caught) selects its codec, if the body then strict-decodes.
3. Otherwise: strict UTF-8; then ISO-2022-JP when its escape sequences
   are present; then Shift_JIS vs EUC-JP decided by strict decode +
   a Japanese-character score (ties prefer Shift_JIS, the more common
   legacy web encoding).
4. Bytes that fail ALL of the above raise UnicodeDecodeError — the
   pipeline's ``decode_error`` status is a deliberate quality signal
   (binary served as text/html should not silently become mojibake), so
   the single-byte floors (cp1252 / latin-1) apply only when a
   declaration names them. A WHATWG browser would always decode; a
   training-corpus pipeline is better served by the honest error.

Returns the decoded text AND the encoding name so corpus stats can
aggregate by charset (a standard crawl-health metric).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

# declaration label -> python codec (aliases per WHATWG encoding labels)
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis", "ms932": "cp932", "cp932": "cp932",
    "windows-31j": "cp932",
    "euc-jp": "euc_jp", "euc_jp": "euc_jp", "x-euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252", "ascii": "utf-8",
    "us-ascii": "utf-8", "utf-16": "utf-16", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_META_RE = re.compile(
    r"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)"""
    r"""|content\s*=\s*["'][^"']*charset\s*=\s*([A-Za-z0-9_\-]+))""",
    re.IGNORECASE,
)

_JP_CHARS = re.compile(r"[぀-ゟ゠-ヿ一-龯]")
_REPLACEMENT_OR_CTRL = re.compile(r"[�\x00-\x08\x0e-\x1f]")


def declared_charset(head: bytes) -> Optional[str]:
    """Codec named by a meta declaration in the first 1024 bytes, if any."""
    m = _META_RE.search(head[:1024].decode("latin-1"))
    if not m:
        return None
    label = (m.group(1) or m.group(2) or "").lower()
    return _LABELS.get(label)


def _jp_score(text: str) -> int:
    return len(_JP_CHARS.findall(text)) - 4 * len(
        _REPLACEMENT_OR_CTRL.findall(text)
    )


def sniff_and_decode(
    html_bytes: bytes, declared: Optional[str] = None
) -> Tuple[str, str]:
    """html bytes -> (text, encoding used); UnicodeDecodeError when the
    bytes match no supported encoding (see module policy #4).

    ``declared`` is a transport-level label (the HTTP Content-Type
    charset a WARC record carries): per WHATWG precedence it outranks the
    in-document <meta> declaration but not a BOM, and like the meta path
    a lying label falls through to detection."""
    if html_bytes.startswith(b"\xef\xbb\xbf"):
        return html_bytes[3:].decode("utf-8", errors="replace"), "utf-8"
    if html_bytes.startswith(b"\xff\xfe"):
        return html_bytes[2:].decode("utf-16-le", errors="replace"), "utf-16-le"
    if html_bytes.startswith(b"\xfe\xff"):
        return html_bytes[2:].decode("utf-16-be", errors="replace"), "utf-16-be"

    if declared:
        codec = _LABELS.get(declared.lower())
        if codec:
            try:
                return html_bytes.decode(codec), codec
            except (UnicodeDecodeError, LookupError):
                pass

    codec = declared_charset(html_bytes)
    if codec:
        try:
            return html_bytes.decode(codec), codec
        except (UnicodeDecodeError, LookupError):
            pass  # lying declaration: fall through to detection

    # ISO-2022-JP is 7-bit (its bytes are also valid UTF-8!), so its
    # unambiguous escape sequences must be checked BEFORE the UTF-8 try
    if b"\x1b$" in html_bytes or b"\x1b(" in html_bytes:
        try:
            return html_bytes.decode("iso2022_jp"), "iso2022_jp"
        except UnicodeDecodeError:
            pass

    try:
        return html_bytes.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass

    candidates = []
    for codec in ("shift_jis", "euc_jp"):
        try:
            candidates.append((html_bytes.decode(codec), codec))
        except UnicodeDecodeError:
            continue
    if candidates:
        # highest JP score wins; stable order makes Shift_JIS the tiebreak
        text, codec = max(candidates, key=lambda c: _jp_score(c[0]))
        return text, codec

    raise UnicodeDecodeError(
        "charset-sniff", html_bytes[:16], 0, 1,
        "bytes match no supported encoding (utf-8/utf-16 BOM, declared "
        "charset, iso-2022-jp, shift_jis, euc_jp)",
    )
