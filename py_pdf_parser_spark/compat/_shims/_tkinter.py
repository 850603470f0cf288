"""Stub: the reference tests' base module imports _tkinter for its
visualiser test machinery, which is out of engine scope."""
ALL_EVENTS = 0
DONT_WAIT = 0
