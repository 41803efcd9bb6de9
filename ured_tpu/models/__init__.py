"""Model zoo: flax modules for every network family in the reference."""

from ured_tpu.models.attention import (
    FavorAttention,
    MultiheadAttention,
    linear_attention,
    linear_attention_elu,
    softmax_attention,
)
from ured_tpu.models.deformnet import DeformNetMatching, NodeDecoder, ResidualNet
from ured_tpu.models.encoder import STN3D, SrcEncoder, TargetEncoder
from ured_tpu.models.completion import PCN, PointDiscriminator, VRCNet
from ured_tpu.models.ffn import ConvBNRelu, PointMLP, SirenMLP
from ured_tpu.models.gcn3d import GCN3DEncoder
from ured_tpu.models.gnn import GraphAttentionNet, ResidualAttentionBlock
from ured_tpu.models.legacy import (
    DeformNetDesign1,
    DeformNetDesign2,
    MLPPositionalEncoding,
    ReNetwork,
)
from ured_tpu.models.pointnet import (
    PointNet2ClsMSG,
    PointNet2ClsSSG,
    PointNet2PartSeg,
    PointNet2SegSSG,
    PointNetCls,
    PointNetSeg,
)
from ured_tpu.models.ured import URED
from ured_tpu.models.vn import VNEncoder, VNRetrieval
