def open(*args, **kwargs):
    raise NotImplementedError("image diffing is visualiser-only")
