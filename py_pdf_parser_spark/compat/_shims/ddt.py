"""Minimal ddt (data-driven tests) stand-in: @ddt expands @data-marked
methods into one test method per datum, like the real package."""


def data(*values):
    def wrapper(func):
        func._ddt_values = values
        return func

    return wrapper


def unpack(func):
    func._ddt_unpack = True
    return func


def ddt(cls):
    for name, func in list(cls.__dict__.items()):
        values = getattr(func, "_ddt_values", None)
        if values is None:
            continue
        for i, value in enumerate(values, 1):
            if getattr(func, "_ddt_unpack", False):
                def case(self, _f=func, _v=value):
                    return _f(self, *_v)
            else:
                def case(self, _f=func, _v=value):
                    return _f(self, _v)
            case.__name__ = f"{name}_{i}"
            setattr(cls, case.__name__, case)
        delattr(cls, name)
    return cls
