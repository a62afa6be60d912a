"""Stand-in for the `humanize` module pypond's util.py imports.
Only the two functions pypond calls; pretty-printing fidelity is
irrelevant to the baseline timing harness."""


def naturaltime(value):
    return str(value)


def naturaldelta(value):
    return str(value)
