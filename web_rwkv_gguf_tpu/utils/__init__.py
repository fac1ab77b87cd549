from .tokenizer import Tokenizer  # noqa: F401
from .sampling import GreedySampler, NucleusSampler, TypicalSampler  # noqa: F401
