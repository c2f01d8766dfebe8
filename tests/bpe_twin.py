"""Independent pure-Python BPE twin (train + encode) shared by the ta14
and pipe06/pipe11/pipe12 tests: word counts -> N trained merges -> encoded
vocab, on the delimited-string representation (str.replace has the exact
left-first non-overlapping semantics the SQL replace-all uses)."""

from __future__ import annotations

N_MERGES = 8


def bpe_encode_vocab(wc: dict, n_merges: int = N_MERGES) -> dict:
    """{word: corpus count} -> {word: n_subwords after n_merges merges}.
    The fixture corpus must keep >= n_merges mergeable pairs alive — the
    SQL apply (CROSS JOIN with the 1-row best) annihilates the vocabulary
    once pairs run dry, and this twin raises instead (same contract)."""
    sp = {w: "··".join(list(w) + ["</w>"]) for w in wc}
    for _ in range(n_merges):
        pairs: dict = {}
        for w, s in sp.items():
            syms = s.split("··")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            raise ValueError("merge exhaustion: fixture corpus too small")
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        pa, pb = best
        old, new = f"·{pa}··{pb}·", f"·{pa}{pb}·"
        sp = {w: ("·" + s + "·").replace(old, new)[1:-1] for w, s in sp.items()}
    return {w: len(s.split("··")) for w, s in sp.items()}


def bpe_train_merges(wc: dict, n_merges: int = N_MERGES) -> list:
    """{word: count} -> the ordered merge list (same tie-break as above)."""
    sp = {w: "··".join(list(w) + ["</w>"]) for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, s in sp.items():
            syms = s.split("··")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pa, pb = best
        old, new = f"·{pa}··{pb}·", f"·{pa}{pb}·"
        sp = {w: ("·" + s + "·").replace(old, new)[1:-1] for w, s in sp.items()}
    return merges
