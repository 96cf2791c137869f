"""Port of the phase-machine specs (RequestItem.spec.coffee:6-28 +
RequestItem.Phases.coffee:44-91 legal-transition graph; SURVEY §2.4 P6)."""

from kermit_spark import phases


def test_full_happy_path_is_legal():
    assert phases.validate_sequence(
        ["INITIAL", "SPOOLED", "READY", "FETCHING", "FETCHED", "COMPLETE"]
    )


def test_error_reachable_from_any_non_terminal():
    for ph in ["INITIAL", "SPOOLED", "READY", "FETCHING", "FETCHED"]:
        assert phases.is_legal(ph, phases.ERROR)
        assert phases.is_legal(ph, phases.CANCELED)


def test_terminal_phases_have_no_followers():
    for ph in [phases.COMPLETE, phases.ERROR, phases.CANCELED]:
        assert not phases.FOLLOWERS[ph]


def test_illegal_skips_rejected():
    # spool guard: only INITIAL may spool (RequestItem.coffee:260-262)
    assert not phases.is_legal("INITIAL", "READY")
    assert not phases.is_legal("SPOOLED", "FETCHED")
    assert not phases.validate_sequence(["INITIAL", "READY"])
    assert not phases.validate_sequence(["SPOOLED", "READY"])  # must start INITIAL


def test_new_item_starts_initial():
    # RequestItem.spec: a fresh item is INITIAL with depth 0 — in the wave
    # engine "a fresh item" is a seed frontier row; covered in frontier tests.
    assert phases.PHASES[0] == phases.INITIAL
