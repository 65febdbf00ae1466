from radegs_tpu.viewer.network_gui import NetworkGUI

__all__ = ["NetworkGUI"]
