"""WHATWG-URL-compatible relative IRI resolution.

The reference resolves relative IRIs with the JS ``new URL(value, base).href``
(/root/reference/src/turtle/reader.ts:1240-1249), which differs from Python's
RFC-3986 ``urljoin`` in several observable ways:

* authority-only results gain a trailing '/' (``//g`` → ``http://g/``);
* path / query / fragment are percent-encoded per the WHATWG encode sets
  (space → %20, non-ASCII → UTF-8 percent escapes) while existing ``%``
  sequences are left untouched;
* backslashes act as path separators for special schemes;
* an empty query (``?``) or fragment (``#``) is preserved verbatim.

This module implements exactly that subset (differential-tested against
``node`` output in tests/fixtures/whatwg_url_cases.json). Callers only pass
references without ':' — the reference treats any value containing a colon
as already absolute (reader.ts:1240).
"""

from __future__ import annotations

import re

_SPECIAL_SCHEMES = {"http", "https", "ws", "wss", "ftp", "file"}

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")


def _encode(s: str, unsafe: frozenset[str]) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if cp <= 0x1F or cp == 0x7F or cp > 0x7E or ch in unsafe:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    return "".join(out)


_PATH_UNSAFE = frozenset(' "<>?`{}#')
_QUERY_UNSAFE = frozenset(' "<>#\'')
_FRAGMENT_UNSAFE = frozenset(' "<>`')


def _split_url(url: str):
    """scheme, authority(or None), path, query(or None), fragment(or None)."""
    m = _SCHEME_RE.match(url)
    if not m:
        raise ValueError(f"base IRI has no scheme: {url!r}")
    scheme = m.group(1).lower()
    rest = url[m.end() :]
    fragment = None
    if "#" in rest:
        rest, fragment = rest.split("#", 1)
    query = None
    if "?" in rest:
        rest, query = rest.split("?", 1)
    authority = None
    if rest.startswith("//"):
        rest = rest[2:]
        idx = len(rest)
        for i, ch in enumerate(rest):
            if ch == "/":
                idx = i
                break
        authority = rest[:idx]
        path = rest[idx:]
    else:
        path = rest
    return scheme, authority, path, query, fragment


def _remove_dot_segments(path: str) -> str:
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:i])
                path = path[i:]
    return "".join(output)


def resolve_iri(ref: str, base: str) -> str:
    """``new URL(ref, base).href`` for colon-free relative references."""
    scheme, authority, b_path, b_query, _ = _split_url(base)
    special = scheme in _SPECIAL_SCHEMES
    if special:
        ref = ref.replace("\\", "/")

    # split ref into path / query / fragment
    r_frag = None
    if "#" in ref:
        ref, r_frag = ref.split("#", 1)
    r_query = None
    if "?" in ref:
        ref, r_query = ref.split("?", 1)
    r_path = ref

    if r_path.startswith("//"):
        # authority-relative
        rest = r_path[2:]
        idx = len(rest)
        for i, ch in enumerate(rest):
            if ch == "/" or ch == "?" or ch == "#":
                idx = i
                break
        authority = rest[:idx]
        t_path = _remove_dot_segments(rest[idx:])
        t_query = r_query
    elif r_path == "":
        t_path = b_path
        t_query = r_query if r_query is not None else b_query
    elif r_path.startswith("/"):
        t_path = _remove_dot_segments(r_path)
        t_query = r_query
    else:
        # merge with base path
        if authority is not None and b_path == "":
            merged = "/" + r_path
        else:
            i = b_path.rfind("/")
            merged = (b_path[: i + 1] if i >= 0 else "") + r_path
        t_path = _remove_dot_segments(merged)
        t_query = r_query

    if authority is not None and special and t_path == "":
        t_path = "/"

    out = [scheme, ":"]
    if authority is not None:
        out.append("//")
        out.append(authority)
    out.append(_encode(t_path, _PATH_UNSAFE))
    if t_query is not None:
        out.append("?")
        out.append(_encode(t_query, _QUERY_UNSAFE))
    if r_frag is not None:
        out.append("#")
        out.append(_encode(r_frag, _FRAGMENT_UNSAFE))
    return "".join(out)
