"""Native (C++) data-loader components with ctypes bindings.

Provides drop-in accelerated versions of the two host-side preprocessing
hot paths (BFS SAG expansion, behaviors.tsv parsing). The shared library
builds on first use with g++ and caches next to the source; every entry
point has a pure-Python fallback in digat_tpu.data, and
`digat_tpu.data.corpus` prefers the native path when the toolchain is
available."""

from digat_tpu.native.bindings import (
    NativeParseError,
    available,
    expand_graph_native,
    parse_behaviors_native,
)

__all__ = [
    "NativeParseError",
    "available",
    "expand_graph_native",
    "parse_behaviors_native",
]
