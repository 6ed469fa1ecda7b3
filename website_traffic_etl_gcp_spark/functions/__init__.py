from .money import dec, dec_sum, dec_avg  # noqa: F401
from .datetimes import parse_dayfirst, iso_str, day_str, hour_str  # noqa: F401
from .texthash import md5_long, normalize_text, word_tokens  # noqa: F401
from .vectors import dot, norm, cosine  # noqa: F401
