class LTComponent:
    """bbox-holding base the reference's fake test elements subclass
    (pdfminer.layout.LTComponent attribute surface: x0/y0/x1/y1,
    width/height)."""

    def __init__(self, bbox):
        self.set_bbox(bbox)

    def set_bbox(self, bbox):
        x0, y0, x1, y1 = bbox
        self.x0 = x0
        self.y0 = y0
        self.x1 = x1
        self.y1 = y1
        self.width = x1 - x0
        self.height = y1 - y0
        self.bbox = (x0, y0, x1, y1)


class LAParams:
    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


class LTFigure(LTComponent):
    pass


class LTTextBox(LTComponent):
    pass
