from .generic import nextpow2, random_code, sec2time, ten_digit, time2sec

__all__ = ["nextpow2", "random_code", "sec2time", "ten_digit", "time2sec"]
