"""Grok pattern dictionary + compiler (pure functions, no Ray).

Reimplements the pattern language of the reference's grok filter
(``ref: filter/grok/`` [U-spec], SURVEY.md §2.2 F1): ``%{PATTERN}``,
``%{PATTERN:name}`` and ``%{PATTERN:name:type}`` tokens resolved against a
pattern dictionary and expanded into one compiled regex with named capture
groups. The dictionary below is a subset of the public logstash/grok base
patterns — only RE2-compatible constructs (no backrefs, no lookaround) so
the compiled pattern runs on Arrow's RE2 engine via
``pyarrow.compute.extract_regex`` (vectorized, zero-copy input).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# RE2-safe subset of the public logstash base pattern dictionary.
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?(?:[0-9]+)",
    "NONNEGINT": r"\b[0-9]+\b",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?)",
    "BASE16NUM": r"[+-]?(?:0x)?(?:[0-9A-Fa-f]+)",
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|"
        r"ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|"
        r"[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?"
    ),
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "TIMESTAMP_ISO8601": (
        r"[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}"
        r"(?::[0-9]{2}(?:\.[0-9]+)?)?(?:Z|[+-][0-9]{2}:?[0-9]{2})?"
    ),
    "QUOTEDSTRING": r"\"[^\"]*\"|'[^']*'",
    "PATH": r"(?:/[\w.-]+)+",
}

_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

_CAST_TYPES = {"int", "float", "string"}


@dataclass
class CompiledGrok:
    """One grok pattern compiled to a regex plus capture metadata."""

    source: str                      # original grok expression
    regex: str                       # expanded regex with (?P<name>...) groups
    captures: list[str] = field(default_factory=list)   # capture names, in order
    casts: dict[str, str] = field(default_factory=dict)  # name -> int|float|string


def compile_grok(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    anchor: bool = False,
) -> CompiledGrok:
    """Expand a grok expression into an RE2-compatible regex.

    ``%{NAME}`` expands inline (non-capturing); ``%{NAME:field}`` expands to a
    named capture group; ``%{NAME:field:int}`` additionally records a type
    cast applied after extraction. Unknown pattern names raise ``KeyError``.
    """
    dictionary = dict(BASE_PATTERNS)
    if extra_patterns:
        dictionary.update(extra_patterns)
    captures: list[str] = []
    casts: dict[str, str] = {}

    def expand(pat: str, depth: int) -> str:
        if depth > 16:
            raise ValueError(f"grok pattern recursion too deep in {pattern!r}")

        def repl(m: re.Match) -> str:
            name, capture, cast = m.group(1), m.group(2), m.group(3)
            if name not in dictionary:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            body = expand(dictionary[name], depth + 1)
            if capture:
                if capture in captures:
                    raise ValueError(f"duplicate capture name {capture!r}")
                captures.append(capture)
                if cast:
                    if cast not in _CAST_TYPES:
                        raise ValueError(f"unknown grok cast {cast!r}")
                    casts[capture] = cast
                return f"(?P<{capture}>{body})"
            return f"(?:{body})"

        return _TOKEN.sub(repl, pat)

    regex = expand(pattern, 0)
    if anchor:
        regex = f"^(?:{regex})$"
    # Validate with Python's re (superset of RE2 for these constructs).
    re.compile(regex)
    return CompiledGrok(source=pattern, regex=regex, captures=captures, casts=casts)
