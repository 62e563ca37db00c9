"""Mini-ftfy: the text-repair subset of `ftfy.fix_text` that CLIP's tokenizer
applies before BPE (clip/simple_tokenizer.py `basic_clean`; reached from
/root/reference/main.py:266, 345, 418, 1034 via clip.tokenize).

ftfy itself is not installable here; this vendors the fixes that matter for
caption corpora, in ftfy's default order of operations:

  1. mojibake repair — UTF-8 bytes that were mis-decoded as windows-1252 /
     latin-1 ("doesnÃ¢â‚¬â„¢t" -> "doesn’t"), applied iteratively like ftfy's
     fix_encoding (double-mojibake needs two passes), gated on a conservative
     indicator pattern so correctly-encoded text is never touched;
  2. C1 control characters reinterpreted as windows-1252 (ftfy fix_c1_controls);
  3. line-break normalization (CRLF/CR/U+2028/U+2029 -> LF);
  4. terminal escapes + control-char removal (keeps \\n and \\t);
  5. halfwidth/fullwidth folding (ＡＢＣ -> ABC, ftfy fix_character_width);
  6. curly-quote uncurling (ftfy uncurl_quotes default);
  7. NFC normalization (ftfy's default normalization).

Remaining divergence from full ftfy (documented in PARITY.md): lossy-sequence
replacement, byte-A0 restoration and surrogate repair are not implemented —
all three need ftfy's character tables and occur at the long tail of web text.
"""

import re
import unicodedata

# UTF-8-as-1252 mojibake indicator: a mangled lead byte (Ã/Â/Ä/Å/â/ð as chars)
# followed by something from the windows-1252 high range's character images.
_W1252_HIGH = (
    "€‚ƒ„…†‡ˆ‰Š‹Œ"
    "Ž‘’“”•–—˜™š›"
    "œžŸ"
)
_MOJIBAKE_RE = re.compile(
    "[\xc2-\xc5\xe2\xf0][\x80-\xbf\xa0-\xff" + _W1252_HIGH + "]"
)
_C1_RE = re.compile("[\x80-\x9f]")
_TERMINAL_ESCAPE_RE = re.compile(r"\x1b\[[0-9;]*[a-zA-Z]")
# controls except \t and \n (after line-break normalization)
_CONTROL_RE = re.compile("[\x00-\x08\x0b-\x1f\x7f]")
_CURLY = {"‘": "'", "’": "'", "“": '"', "”": '"'}
_LINE_BREAKS = {"\r\n": "\n", "\r": "\n", "\u2028": "\n", "\u2029": "\n", "\x85": "\n"}


def _encode_sloppy_1252(s: str) -> bytes:
    """Invert a windows-1252 mis-decode; like ftfy's sloppy-windows-1252, the
    26 codepoints 1252 leaves undefined fall back to their latin-1 bytes."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o > 0xFF:
                raise
            out.append(o)
    return bytes(out)


def _fix_mojibake(s: str) -> str:
    for _ in range(3):  # double-mojibake unwinds one layer per pass
        if not _MOJIBAKE_RE.search(s):
            break
        try:
            fixed = _encode_sloppy_1252(s).decode("utf-8")
        except (UnicodeDecodeError, UnicodeEncodeError):
            break
        if fixed == s:
            break
        s = fixed
    return s


def _fix_c1(s: str) -> str:
    """Raw C1 controls are almost always windows-1252 that was decoded as
    latin-1 ("\\x92" -> right single quote)."""

    def repl(m):
        try:
            return bytes([ord(m.group(0))]).decode("cp1252")
        except UnicodeDecodeError:
            return m.group(0)

    return _C1_RE.sub(repl, s)


def _fold_width(s: str) -> str:
    out = []
    for ch in s:
        if "！" <= ch <= "｠" or "￠" <= ch <= "￦":
            out.append(unicodedata.normalize("NFKC", ch))
        else:
            out.append(ch)
    return "".join(out)


def fix_text(s: str) -> str:
    """ftfy.fix_text's caption-relevant subset; see module docstring."""
    s = _fix_mojibake(s)
    s = _fix_c1(s)
    for k, v in _LINE_BREAKS.items():
        s = s.replace(k, v)
    s = _TERMINAL_ESCAPE_RE.sub("", s)
    s = _CONTROL_RE.sub("", s)
    s = _fold_width(s)
    for k, v in _CURLY.items():
        s = s.replace(k, v)
    return unicodedata.normalize("NFC", s)
