"""Exhaustive checks of the stable-solver lookup tables against brute-force
enumeration of concrete neighbourhoods (the strategy SURVEY.md section 7
prescribes for netlist parity: every table is small enough to verify
exhaustively)."""

import itertools

import numpy as np
import pytest

from lifeapi_tpu.stable import options as opt


def brute_cases(center, on_n, unk_n):
    """All (center_live, neighbour_count) still-life situations reachable
    from interval knowledge: center resolves per its three-state, each
    unknown neighbour resolves ON or OFF."""
    centers = {opt.ON: [True], opt.OFF: [False], opt.UNKNOWN: [True, False]}
    for c_live in centers[center]:
        for extra in range(unk_n + 1):
            yield c_live, on_n + extra


def option_bit(c_live, count):
    for bit, (live, cnt) in opt.OPTION_SEMANTICS.items():
        if live == c_live and cnt == count:
            return bit
    return None


def test_update_lut_sound_and_tight():
    lut = opt.update_lut()
    for center in (opt.OFF, opt.ON, opt.UNKNOWN):
        for on9 in range(10):
            for unk9 in range(10 - on9):
                nc = opt._neighbour_counts(center, on9, unk9)
                if nc is None:
                    continue
                on_n, unk_n = nc
                if on_n + unk_n > 8:
                    continue  # unreachable window contents
                out = int(lut[center, on9, unk9])
                ruled, abort = out & 0xFF, bool(out >> 8)
                # brute force the set of stable options actually achievable
                achievable = 0
                for c_live, count in brute_cases(center, on_n, unk_n):
                    if opt.life_stable(c_live, count):
                        bit = option_bit(c_live, count)
                        if bit is not None:
                            achievable |= bit
                if abort:
                    assert achievable == 0, (center, on9, unk9)
                else:
                    # soundness: nothing achievable may be ruled out
                    assert ruled & achievable == 0, (center, on9, unk9)
                    # tightness: everything unachievable must be ruled out
                    assert (ruled | achievable) == 0xFF or (
                        0xFF & ~ruled & ~achievable
                    ) == 0, (center, on9, unk9)


def test_update_lut_abort_matches_reference_rule():
    # reference options_function aborts: ON center with upper<2 or lower>3;
    # OFF center with exactly 3 or lower>6; UNKNOWN center with lower>6
    lut = opt.update_lut()
    assert lut[opt.ON, 1, 0] >> 8  # ON with 0 neighbours: dies
    assert lut[opt.ON, 6, 0] >> 8  # ON with 5 neighbours: dies
    assert lut[opt.OFF, 3, 0] >> 8  # OFF with exactly 3: birth
    assert lut[opt.OFF, 7, 0] >> 8  # OFF with 7: no dead7 option
    assert not lut[opt.OFF, 2, 1] >> 8
    assert not lut[opt.UNKNOWN, 2, 2] >> 8


def test_simple_lut_sound():
    lut = opt.simple_lut()
    for center in (opt.OFF, opt.ON, opt.UNKNOWN):
        for on9 in range(10):
            for unk9 in range(10 - on9):
                nc = opt._neighbour_counts(center, on9, unk9)
                if nc is None:
                    continue
                on_n, unk_n = nc
                if on_n + unk_n > 8:
                    continue
                bits = int(lut[center, on9, unk9])
                set_off, set_on = bits & 1, bits & 2
                sig_off, sig_on = bits & 4, bits & 8
                abort = bits & 16
                # enumerate stable-consistent completions: center choice +
                # how many unknowns are ON
                ok_assignments = [
                    (c_live, extra)
                    for c_live, count in brute_cases(center, on_n, unk_n)
                    if opt.life_stable(c_live, count)
                    for extra in [count - on_n]
                ]
                if abort:
                    assert not ok_assignments, (center, on9, unk9)
                    continue
                if set_on:
                    assert all(c for c, _ in ok_assignments), (center, on9, unk9)
                if set_off:
                    assert all(not c for c, _ in ok_assignments), (center, on9, unk9)
                if sig_on and unk_n:
                    assert all(e == unk_n for _, e in ok_assignments), (
                        center, on9, unk9)
                if sig_off and unk_n:
                    assert all(e == 0 for _, e in ok_assignments), (
                        center, on9, unk9)


def test_signal_rule_block_case():
    # An ON cell with 2 known ON neighbours and 5 unknown: could settle at
    # live2 (all unknowns OFF) or live3 (one ON) — nothing forced.
    n = opt.Nbhd(opt.ON, 2, 5)
    mask = opt.DEAD_MASK  # live2|live3 possible
    sn, sf, cn, cf = opt.signal_rule(mask, n)
    assert (sn, sf) == (0, 0)
    # With 3 known ON neighbours, live2 is impossible, so live3 is exact:
    # every unknown neighbour is forced OFF.
    n_forced = opt.Nbhd(opt.ON, 3, 5)
    sn, sf, cn, cf = opt.signal_rule(mask, n_forced)
    assert (sn, sf) == (0, 1)
    # But if live3 is also ruled out (only live2 possible) and it already
    # has 2 ON neighbours, remaining unknowns are forced OFF.
    n2 = opt.Nbhd(opt.ON, 2, 6)
    mask2 = opt.DEAD_MASK | opt.LIVE3
    sn, sf, cn, cf = opt.signal_rule(mask2, n2)
    assert (sn, sf) == (0, 1)
    # Dually: only live3 possible with 2 known ON and 1 unknown: forced ON.
    n3 = opt.Nbhd(opt.ON, 2, 1)
    mask3 = opt.DEAD_MASK | opt.LIVE2
    sn, sf, cn, cf = opt.signal_rule(mask3, n3)
    assert (sn, sf) == (1, 0)


def test_ternary_lut_matches_bruteforce():
    for naive in (False, True):
        lut = opt.ternary_lut(naive=naive)
        for center in (opt.OFF, opt.ON, opt.UNKNOWN):
            for on9 in range(10):
                for unk9 in range(10 - on9):
                    nc = opt._neighbour_counts(center, on9, unk9)
                    if nc is None:
                        continue
                    on_n, unk_n = nc
                    if on_n + unk_n > 8:
                        continue
                    got = int(lut[center, on9, unk9])
                    if naive and center == opt.UNKNOWN:
                        assert got == opt.UNKNOWN
                        continue
                    nexts = set()
                    for c_live, count in brute_cases(center, on_n, unk_n):
                        alive = count in (2, 3) if c_live else count == 3
                        nexts.add(alive)
                    if nexts == {True}:
                        assert got == opt.ON, (center, on9, unk9)
                    elif nexts == {False}:
                        assert got == opt.OFF, (center, on9, unk9)
                    else:
                        assert got == opt.UNKNOWN, (center, on9, unk9)


def test_vulnerable_lut_nonzero():
    lut = opt.vulnerable_lut()
    assert lut.any()  # sanity: the heuristic fires somewhere
    # a cell with one unknown neighbour cannot be "vulnerable on/off"
    # (n.unknown <= 1 guard)
    for mask in range(0, 256, 17):
        bits = int(lut[mask, 1, 1])
        assert bits & 0b11 == 0 or opt.three_state(mask) == opt.UNKNOWN
