"""Text sanitization + entity-name normalization (reference-parity).

These pure functions reproduce, behavior-for-behavior, the normalization
contract of the reference implementation:

- ``sanitize_text_for_encoding``   ~ /root/reference/lightrag/utils.py:4835-4873
- ``strip_control_characters``     ~ utils.py:4876-4894
- ``normalize_extracted_info``     ~ utils.py:4702-4832
- ``normalize_entity_name``        ~ utils.py:4697-4700
- ``split_string_by_multi_markers``~ utils.py:3310-3316
- ``fix_tuple_delimiter_corruption``~ utils.py:5967-6090
- ``truncate_entity_identifier``   ~ operate.py:205-242
- ``strip_markdown_code_fence``    ~ utils.py:4991-5010

They are written fresh for this engine (different structure, same observable
behavior) and are deliberately dependency-free so they can run unchanged
inside Arrow-batched pandas UDFs on executors.  The sanitize step is the
"HTML-to-text stage" whose output must be byte-identical per url.
"""

from __future__ import annotations

import html
import re

# Surrogate halves and the two BMP non-characters; removing them is what makes
# the output safely UTF-8 encodable (utils.py:63).
_SURROGATES = re.compile(r"[\uD800-\uDFFF\uFFFE\uFFFF]")
# C0 control chars except \t \n \r, plus DEL (utils.py:64).
_CONTROLS = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")

_P_TAGS = re.compile(r"</p\s*>|<p\s*>|<p/>", re.IGNORECASE)
_BR_TAGS = re.compile(r"</br\s*>|<br\s*>|<br/>", re.IGNORECASE)

_FULLWIDTH_MAP = str.maketrans(
    "ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ"
    "ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ"
    "０１２３４５６７８９",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
)

_CJK = "一-龥"
_SPACE_BETWEEN_CJK = re.compile(rf"(?<=[{_CJK}])\s+(?=[{_CJK}])")
_SPACE_CJK_TO_ASCII = re.compile(rf"(?<=[{_CJK}])\s+(?=[a-zA-Z0-9\(\)\[\]@#$%!&\*\-=+_])")
_SPACE_ASCII_TO_CJK = re.compile(rf"(?<=[a-zA-Z0-9\(\)\[\]@#$%!&\*\-=+_])\s+(?=[{_CJK}])")
_QUOTES_BEFORE_CJK = re.compile(rf"['\"]+(?=[{_CJK}])")
_QUOTES_AFTER_CJK = re.compile(rf"(?<=[{_CJK}])['\"]+")
_NNBSP_AFTER_NONDIGIT = re.compile(r"(?<=[^\d])\u202F")
_PURE_DIGITS = re.compile(r"^[0-9]+$")

_CODE_FENCE = re.compile(r"^\s*```[a-zA-Z0-9_+-]*\s*\n(.*?)\n?\s*```\s*$", re.DOTALL)


def sanitize_text_for_encoding(text: str, replacement_char: str = "") -> str:
    """Make ``text`` safely UTF-8 encodable (byte-identical to the reference).

    Pipeline: strip -> html.unescape -> drop surrogates/non-chars -> drop
    control chars (keeping \\t \\n \\r) -> strip.
    """
    if not text:
        return text
    text = text.strip()
    if not text:
        return text
    text = html.unescape(text)
    text = _SURROGATES.sub(replacement_char, text)
    text = _CONTROLS.sub(replacement_char, text)
    return text.strip()


def strip_control_characters(text: str, replacement_char: str = "") -> str:
    """Like :func:`sanitize_text_for_encoding` but with no unescape/strip —
    safe for text carrying intentional markup or significant whitespace."""
    if not text:
        return text
    text = _SURROGATES.sub(replacement_char, text)
    return _CONTROLS.sub(replacement_char, text)


def _strip_outer_pair(name: str, opener: str, closer: str) -> str:
    if name.startswith(opener) and name.endswith(closer) and len(name) >= 2:
        inner = name[1:-1]
        if opener == closer:
            if opener not in inner:
                return inner
        elif opener not in inner and closer not in inner:
            return inner
    return name


def _is_digits_and_dots(text: str) -> bool:
    return all(c.isdigit() or c == "." for c in text) and "." in text


def normalize_extracted_info(name: str, remove_inner_quotes: bool = False) -> str:
    """Normalize an extracted entity/relation name or description.

    Rules (same contract as the reference, utils.py:4702-4832): strip <p>/<br>
    tags; full-width->half-width letters/digits/symbols; Chinese punctuation ->
    ASCII; remove spaces between CJK chars and across CJK/ASCII boundaries;
    strip one layer of paired outer quotes / book-title marks; optionally drop
    inner CJK quotes and quotes hugging CJK text plus NBSP normalization;
    drop pure digit strings shorter than 3 and digit-dot strings shorter
    than 6.
    """
    name = _P_TAGS.sub("", name)
    name = _BR_TAGS.sub("", name)
    name = name.translate(_FULLWIDTH_MAP)
    name = (
        name.replace("－", "-")
        .replace("＋", "+")
        .replace("／", "/")
        .replace("＊", "*")
        .replace("（", "(")
        .replace("）", ")")
        .replace("—", "-")
        .replace("　", " ")
    )
    name = _SPACE_BETWEEN_CJK.sub("", name)
    name = _SPACE_CJK_TO_ASCII.sub("", name)
    name = _SPACE_ASCII_TO_CJK.sub("", name)

    if len(name) >= 2:
        name = _strip_outer_pair(name, '"', '"')
        name = _strip_outer_pair(name, "'", "'")
        name = _strip_outer_pair(name, "“", "”")  # “ ”
        name = _strip_outer_pair(name, "‘", "’")  # ‘ ’
        name = _strip_outer_pair(name, "《", "》")

    if remove_inner_quotes:
        for q in ("“", "”", "‘", "’"):
            name = name.replace(q, "")
        name = _QUOTES_BEFORE_CJK.sub("", name)
        name = _QUOTES_AFTER_CJK.sub("", name)
        name = name.replace("\u00a0", " ")
        name = _NNBSP_AFTER_NONDIGIT.sub(" ", name)

    name = name.strip()

    if len(name) < 3 and _PURE_DIGITS.match(name):
        return ""
    if len(name) < 6 and _is_digits_and_dots(name):
        return ""
    return name


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=65536)
def sanitize_and_normalize_extracted_text(text: str, remove_inner_quotes: bool = False) -> str:
    """sanitize -> normalize composition used on every extracted field
    (utils.py:4675-4695).  Pure -> memoized: entity names and types repeat
    across records with a heavy Zipf head, so the extraction UDF hits this
    cache far more often than it computes."""
    safe = sanitize_text_for_encoding(text)
    if not safe:
        return ""
    return normalize_extracted_info(safe, remove_inner_quotes=remove_inner_quotes)


def normalize_entity_name(name: str) -> str:
    """The canonicalization key of the entity merge (utils.py:4697-4700)."""
    return sanitize_and_normalize_extracted_text(name, remove_inner_quotes=True)


from functools import lru_cache


@lru_cache(maxsize=256)
def _split_pattern(markers: tuple[str, ...]):
    return re.compile("|".join(re.escape(m) for m in markers))


def split_string_by_multi_markers(content: str, markers: list[str]) -> list[str]:
    """Split on any of ``markers``, strip fragments, drop empties
    (utils.py:3310-3316)."""
    if not markers:
        return [content]
    content = content if content is not None else ""
    parts = _split_pattern(tuple(markers)).split(content)
    return [p.strip() for p in parts if p.strip()]


def fix_tuple_delimiter_corruption(record: str, delimiter_core: str, tuple_delimiter: str) -> str:
    """Repair the known LLM corruption shapes of ``<|#|>`` delimiters
    (utils.py:5967-6090).  Each substitution handles one corruption family;
    together they normalize any near-miss spelling of the delimiter back to
    the canonical form before field splitting.
    """
    if not record or not delimiter_core or not tuple_delimiter:
        return record
    # Fast path: every corruption pattern needs a '<' or '|' somewhere, and
    # matches that lie entirely inside well-formed delimiters replace them
    # with themselves (identity).  So if the record minus its exact
    # delimiters contains neither '<' nor '|', all 14 substitutions are
    # no-ops and can be skipped.  (C-level scan vs 14 regex passes — the
    # common case for a well-behaved model.)
    stripped = record.replace(tuple_delimiter, "")
    if "<" not in stripped and "|" not in stripped:
        return record
    for pattern, repl in _corruption_fixes(delimiter_core, tuple_delimiter):
        record = pattern.sub(repl, record)
    return record


@lru_cache(maxsize=16)
def _corruption_fixes(delimiter_core: str, tuple_delimiter: str):
    core = re.escape(delimiter_core)
    fixes = [
        # doubled cores: <|##|>, <|#||#|>, <|#|||#|>
        (rf"<\|{core}\|*?{core}\|>", tuple_delimiter),
        # escaped core: <|\#|>
        (rf"<\|\\{core}\|>", tuple_delimiter),
        # empty glued separator: a<|>b, a<||>b (keep spaced free text)
        (r"(?<=\S)<\|+>(?=\S)", tuple_delimiter),
        # one stray char outside the pipes: <X|#|>, <|#|Y>, <X|#|Y>, <||#||>
        (rf"<.?\|{core}\|.?>", tuple_delimiter),
        # missing pipes: <#>, <#|>, <|#>
        (rf"<\|?{core}\|?>", tuple_delimiter),
        # a pipe replaced by another char: <X#|>, <|#X>
        (rf"<[^|]{core}\|>|<\|{core}[^|]>", tuple_delimiter),
        # missing closing >: <|#|, <|#||
        (rf"<\|{core}\|+(?!>)", tuple_delimiter),
        # colon tail: <|#:
        (rf"<\|{core}:(?!>)", tuple_delimiter),
        # double pipe at start, no pipe at end: <||#>
        (rf"<\|+{core}>", tuple_delimiter),
        # bare glued <|| opener
        (r"(?<=\S)<\|\|(?!>)", tuple_delimiter),
        # missing opening <: |#|>
        (rf"(?<!<)\|{core}\|>", tuple_delimiter),
        # trailing pipe after a good delimiter: <|#|>|
        (rf"<\|{core}\|>\|", tuple_delimiter),
        # pipes only, no angles: ||#||
        (rf"\|\|{core}\|\|", tuple_delimiter),
    ]
    return [(re.compile(p), r) for p, r in fixes]


def truncate_entity_identifier(
    identifier: str,
    char_limit: int = 256,
    byte_limit: int = 512,
) -> str:
    """Clamp an entity identifier to both a char and a UTF-8 byte budget,
    cutting on a character boundary (operate.py:205-242)."""
    if len(identifier) <= char_limit and len(identifier.encode("utf-8")) <= byte_limit:
        return identifier
    clipped = identifier[:char_limit]
    encoded = clipped.encode("utf-8")
    if len(encoded) > byte_limit:
        clipped = encoded[:byte_limit].decode("utf-8", errors="ignore")
    return clipped


def strip_markdown_code_fence(text: str) -> str:
    """Remove one enclosing ``` fence if the whole payload is fenced
    (utils.py:4991-5010)."""
    if not text:
        return text
    m = _CODE_FENCE.match(text)
    if m:
        return m.group(1).strip()
    return text.strip()
