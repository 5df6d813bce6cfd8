from tpusr.models.skip import SkipNet, build_dip_net
from tpusr.models.srgan import Discriminator, Generator

__all__ = ["SkipNet", "build_dip_net", "Generator", "Discriminator"]
