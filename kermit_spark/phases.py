"""The processing-phase model — the reference's 8-state item machine as data.

Re-expresses /root/reference/src/kermit/RequestItem.Phases.coffee:44-91: the
phase set and its legal-transition graph (follower/predecessor). In the wave
engine a phase is not a live mutation but a pipeline position: each wave stage
corresponds to one transition, and stage outputs are validated against this
graph in tests (SURVEY §2.4 P6) and stamped into the lineage table.

Transition → wave-stage mapping (P1-P9):
  INITIAL  → SPOOLED   : admission into the wave (filter pass)
  SPOOLED  → READY     : politeness dequeue selected the row
  READY    → FETCHING  : fetch stage dispatch
  FETCHING → FETCHED   : response row produced
  FETCHED  → COMPLETE  : parse + store succeeded
  any      → ERROR     : fetch/parse failure (appends reason, P7)
  non-terminal → CANCELED : filtered out mid-flight (F9)
"""

from __future__ import annotations

INITIAL = "INITIAL"
SPOOLED = "SPOOLED"
READY = "READY"
FETCHING = "FETCHING"
FETCHED = "FETCHED"
COMPLETE = "COMPLETE"
ERROR = "ERROR"
CANCELED = "CANCELED"

PHASES = [INITIAL, SPOOLED, READY, FETCHING, FETCHED, COMPLETE, ERROR, CANCELED]

# legal follower sets (RequestItem.Phases.coffee:68-91: follower/predecessor
# definitions; ERROR/CANCELED reachable from any non-terminal phase,
# RequestItem.coffee:295-305)
FOLLOWERS: dict[str, set[str]] = {
    INITIAL: {SPOOLED, ERROR, CANCELED},
    SPOOLED: {READY, ERROR, CANCELED},
    READY: {FETCHING, ERROR, CANCELED},
    FETCHING: {FETCHED, ERROR, CANCELED},
    FETCHED: {COMPLETE, ERROR, CANCELED},
    COMPLETE: set(),
    ERROR: set(),
    CANCELED: set(),
}

TERMINAL = {COMPLETE, ERROR, CANCELED}


def is_legal(prev: str, nxt: str) -> bool:
    return nxt in FOLLOWERS.get(prev, set())


def validate_sequence(seq: list[str]) -> bool:
    """True iff the sequence starts at INITIAL and every hop is legal —
    the TransitionRecorder assertion of the reference's test harness
    (util/spec.utils.coffee:11-38)."""
    if not seq or seq[0] != INITIAL:
        return False
    return all(is_legal(a, b) for a, b in zip(seq, seq[1:]))
