from .scalars import epoch_bucket, iso8601_utc, mid_price, utc_second  # noqa: F401
