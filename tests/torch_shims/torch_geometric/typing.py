from typing import Optional, Tuple

from torch import Tensor

OptTensor = Optional[Tensor]
Adj = object
Size = Optional[Tuple[int, int]]
OptPairTensor = Tuple[Tensor, Optional[Tensor]]
