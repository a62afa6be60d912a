"""Stand-in for `tzlocal`: the baseline harness pins the local zone to
UTC (matching the Spark session timezone used everywhere in graft)."""
import pytz


def get_localzone():
    return pytz.utc
