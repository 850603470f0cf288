"""Stub: base.py imports tkinter for the (out-of-scope) visualiser."""


class Tk:
    def destroy(self):
        pass

    def dooneevent(self, *args):
        return 0
