"""Offline canonical-Huffman table generator — the literal huffgen
equivalent (reference utils/huffgen.cpp: histograms in, table literals +
entropy-loss report out).

Reads one histogram per line (whitespace-separated counts) from stdin or
a file, emits python-literal (lengths, codes) pairs for ops/vlc.py and
prints the Huffman-vs-entropy loss per table, exactly the diagnostic the
reference prints (huffgen.cpp:80-95).

Usage: python tools/huffgen.py [hist.txt] [--max-len N]
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from ric_tpu.ops import vlc


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_len = 15
    for a in sys.argv[1:]:
        if a.startswith("--max-len"):
            max_len = int(a.split("=")[1])
    src = open(args[0]) if args else sys.stdin
    total_loss = 0.0
    for t, line in enumerate(src):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        freqs = np.asarray([float(v) for v in line.split()])
        lens = vlc.make_lengths(freqs, max_len=max_len)
        codes = vlc.canonical_codes(lens)
        act = freqs > 0
        p = freqs[act] / freqs[act].sum()
        ent = float(-(p * np.log2(p)).sum())
        avg = float((p * lens[act]).sum())
        loss = 100.0 * (avg / max(ent, 1e-9) - 1.0)
        total_loss += loss
        print(f"# table {t}: entropy {ent:.4f} bits/sym, huffman {avg:.4f} "
              f"(+{loss:.2f}%)")
        print(f"LEN_{t} = {list(map(int, lens))}")
        print(f"CODE_{t} = {list(map(int, codes))}")
    print(f"# mean loss vs entropy: "
          f"{total_loss / max(t + 1, 1):.2f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
