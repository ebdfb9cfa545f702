#!/usr/bin/env python
"""Build and run the reference orbit-enumeration baseline (BASELINE.md
measurement style).

Copies the reference headers to a temp dir, applies the 2-line GCC shim
documented in BASELINE.md (drop ``constexpr`` on ``LifeState::Cell``, add
``<cstring>``), stubs the absent xxHash submodule with a splitmix-style
64-bit mixer (hashing 512 B is a comparable small cost), compiles
``orbit_bench.cpp`` with ``-O3 -march=native``, runs it single-threaded,
and prints its one JSON line.
"""

import pathlib
import shutil
import subprocess
import sys
import tempfile

REF = pathlib.Path("/root/reference")
HERE = pathlib.Path(__file__).resolve().parent

XXHASH_STUB = """\
#pragma once
#include <cstdint>
#include <cstring>
// splitmix64-based stub for the absent xxHash submodule (BASELINE.md:
// hashing is a small part of the orbit cost; this approximates xxh3's
// throughput class for 512-byte inputs).
static inline uint64_t XXH3_64bits(const void *data, size_t len) {
  const uint8_t *p = (const uint8_t *)data;
  uint64_t h = 0x9E3779B97F4A7C15ull ^ (uint64_t)len;
  while (len >= 8) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    h ^= w;
    h *= 0xBF58476D1CE4E5B9ull;
    h ^= h >> 27;
    p += 8;
    len -= 8;
  }
  while (len--) {
    h ^= *p++;
    h *= 0x94D049BB133111EBull;
  }
  h ^= h >> 31;
  return h;
}
"""


def main():
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        for h in REF.glob("*.hpp"):
            shutil.copy(h, tdp / h.name)
        # GCC shim (BASELINE.md)
        api = (tdp / "LifeAPI.hpp").read_text()
        api = api.replace(
            "static constexpr LifeState", "static LifeState"
        )
        api = api.replace(
            "#include <array>", "#include <array>\n#include <cstring>"
        )
        (tdp / "LifeAPI.hpp").write_text(api)
        (tdp / "xxHash").mkdir()
        (tdp / "xxHash" / "xxhash.h").write_text(XXHASH_STUB)

        exe = tdp / "orbit_bench"
        subprocess.run(
            ["g++", "-std=c++20", "-O3", "-march=native",
             "-I", str(tdp), str(HERE / "orbit_bench.cpp"), "-o", str(exe)],
            check=True,
        )
        out = subprocess.run([str(exe)], check=True, capture_output=True,
                             text=True)
        sys.stdout.write(out.stdout)


if __name__ == "__main__":
    main()
