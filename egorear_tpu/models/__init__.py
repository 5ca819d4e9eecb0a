from egorear_tpu.models.backbone import ResNet18, EfficientFPN, BackboneWithFPN
from egorear_tpu.models.heatmap_net import HeatmapNet
from egorear_tpu.models.mvfex import HeatmapMVFexNet, MVFexRefiner
from egorear_tpu.models.pose3d import Pose3DLifter, EgoRearNet
