"""Filespec glob expansion + target validation/classification (operators
S3/S4, SURVEY.md §2.1).

Reference semantics recreated from
``/root/reference/lib/rika/cli/args_parser.rb:160-233``:

- globs (``*``, ``?``, ``[abc]``, ``{a,b}``, ``**``) are expanded in-app;
  directories are silently dropped (``:214-233``);
- every candidate is partitioned into valid targets vs a typed issues map:
  ``non_existent_file``, ``empty_file``, ``is_symlink_wont_process``,
  ``file_with_url_characters``, ``bad_url_scheme``, ``invalid_url``
  (taxonomy listed at ``lib/rika/cli/rika_command.rb:106-115``);
- http/https URLs pass through as URL targets (scheme allow-list,
  ``args_parser.rb:196-207``).

This is driver-side pure Python (file-mode ingest); in table mode the same
taxonomy is applied row-level inside the sniff stage (§2.8).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

URL_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_URL_CHARS_RE = re.compile(r"[?#]")
_GLOB_CHARS_RE = re.compile(r"[*?\[\]{}]")


@dataclass
class TargetClassification:
    targets: list[str] = field(default_factory=list)  # files + urls, in order
    issues: dict[str, list[str]] = field(default_factory=dict)

    def add_issue(self, kind: str, candidate: str) -> None:
        self.issues.setdefault(kind, []).append(candidate)

    @property
    def bad_count(self) -> int:
        return sum(len(v) for v in self.issues.values())


def expand_braces(pattern: str) -> list[str]:
    """``{a,b}`` brace expansion (Python's glob lacks it; rika documents it
    at README.md:154-191)."""
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    pre, post = pattern[: m.start()], pattern[m.end() :]
    out: list[str] = []
    for alt in m.group(1).split(","):
        out.extend(expand_braces(pre + alt + post))
    return out


def expand_filespec(pattern: str) -> list[str]:
    """Expand one filespec into matching paths (files only, sorted;
    directories silently dropped). Non-glob specs pass through verbatim so
    missing files can be classified, mirroring the reference."""
    expanded: list[str] = []
    for alt in expand_braces(pattern):
        if _GLOB_CHARS_RE.search(alt):
            matches = sorted(_glob.glob(alt, recursive=True))
            expanded.extend(m for m in matches if not os.path.isdir(m))
        else:
            expanded.append(alt)
    return expanded


def classify_targets(candidates: list[str]) -> TargetClassification:
    """Partition argv-style candidates into [targets, issues] — the scale
    port of ``process_args_for_targets``."""
    out = TargetClassification()
    for cand in candidates:
        if URL_SCHEME_RE.match(cand):
            parsed = urlparse(cand)
            if parsed.scheme not in ("http", "https"):
                out.add_issue("bad_url_scheme", cand)
            elif not parsed.netloc:
                out.add_issue("invalid_url", cand)
            else:
                out.targets.append(cand)
            continue
        for path in expand_filespec(cand):
            if os.path.isdir(path):
                continue  # silently dropped
            if not os.path.exists(path):
                out.add_issue("non_existent_file", path)
            elif os.path.islink(path):
                out.add_issue("is_symlink_wont_process", path)
            elif _URL_CHARS_RE.search(os.path.basename(path)):
                out.add_issue("file_with_url_characters", path)
            elif os.path.getsize(path) == 0:
                out.add_issue("empty_file", path)
            else:
                out.targets.append(path)
    return out


def prepend_environment_args(
    argv: list[str], env_var: str = "RIKA_RAY_OPTIONS"
) -> list[str]:
    """Env-var option source (S5): shell-split ``$RIKA_RAY_OPTIONS`` is
    prepended so CLI args override it (reference:
    ``args_parser.rb:138-149``)."""
    import shlex

    raw = os.environ.get(env_var, "")
    if not raw:
        return list(argv)
    return shlex.split(raw) + list(argv)
