"""Torch re-executions of the reference's composed models, used as test
oracles (same legitimate role as tests/test_torch_import.py's ResNet).

Module NESTING mirrors the reference exactly so state_dict keys match a
real reference checkpoint: EncoderTransformer (hand_net.py:315-398),
EncoderTransformerCoarse (:216-311), vision_transformer.py Transformer
(Residual/PreNorm wrappers), vision_transformer_attn.py Transformer
(bare Attention + PreNormAttn), PositionalEncoding (hand_net.py:61-77),
5-output ResNet-50 with the fc1 head (resnet.py:101-162).
"""

import math

import torch
import torch.nn as nn

from test_torch_import import TorchBottleneck


class TorchResNet50Head(nn.Module):
    """resnet.py:101-162: 5-output forward + relu/fc1/relu head."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = nn.AvgPool2d(7, stride=1)
        self.fc1 = nn.Linear(2048, 1024)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride,
                                  downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        f = self.avgpool(x4)
        f = f.view(f.size(0), -1)
        f = self.relu(f)
        f = self.fc1(f)
        f = self.relu(f)
        return f, x1, x2, x3, x4


class Residual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x, **kwargs):
        return self.fn(x, **kwargs) + x


class PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x, **kwargs):
        return self.fn(self.norm(x), **kwargs)


class PreNormAttn(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim)

    def forward(self, x, **kwargs):
        return self.norm(x)


class FeedForward(nn.Module):
    def __init__(self, dim, hidden_dim, out_dim=None):
        super().__init__()
        out = dim // 2 if out_dim is None else 3
        self.net = nn.Sequential(nn.Linear(dim, hidden_dim), nn.GELU(),
                                 nn.Linear(hidden_dim, out))

    def forward(self, x):
        return self.net(x)


class Attention(nn.Module):
    def __init__(self, dim, heads=8, dim_head=64, dropout=0.0,
                 return_attn=False):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.return_attn = return_attn
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim),
                                    nn.Dropout(dropout))

    def forward(self, x, mask=None):
        b, n, _ = x.shape
        h = self.heads
        q, k, v = [t.reshape(b, n, h, -1).permute(0, 2, 1, 3)
                   for t in self.to_qkv(x).chunk(3, -1)]
        dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
        attn = dots.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
        out = self.to_out(out)
        if self.return_attn:
            return out, attn
        return out


class Transformer(nn.Module):
    """vision_transformer.py:82-101."""

    def __init__(self, dim, depth, heads, dim_head, mlp_dim,
                 dropout=0.0):
        super().__init__()
        self.layers = nn.ModuleList([])
        for i in range(depth):
            if i == depth - 1:
                self.layers.append(nn.ModuleList([
                    Residual(PreNorm(dim, Attention(
                        dim, heads=heads, dim_head=dim_head,
                        dropout=dropout))),
                    FeedForward(dim, (dim * 3) // 4, out_dim=3)]))
            else:
                self.layers.append(nn.ModuleList([
                    Residual(PreNorm(dim, Attention(
                        dim, heads=heads, dim_head=dim_head,
                        dropout=dropout))),
                    PreNorm(dim, FeedForward(dim, (dim * 3) // 4))]))
                dim = dim // 2

    def forward(self, x, mask=None):
        for attn, ff in self.layers:
            x = attn(x, mask=mask)
            x = ff(x)
        return x


class TransformerAttn(nn.Module):
    """vision_transformer_attn.py:89-113."""

    def __init__(self, dim, depth, heads, dim_head, mlp_dim,
                 dropout=0.0):
        super().__init__()
        self.layers = nn.ModuleList([])
        for i in range(depth):
            attn = Attention(dim, heads=heads, dim_head=dim_head,
                             dropout=dropout, return_attn=True)
            if i == depth - 1:
                self.layers.append(nn.ModuleList([
                    attn, PreNormAttn(dim),
                    FeedForward(dim, (dim * 3) // 4, out_dim=3)]))
            else:
                self.layers.append(nn.ModuleList([
                    attn, PreNormAttn(dim),
                    PreNorm(dim, FeedForward(dim, (dim * 3) // 4))]))
                dim = dim // 2

    def forward(self, x, mask=None):
        for attention, pren, ff in self.layers:
            x1, attn = attention(x, mask=mask)
            x = pren(x1) + x
            x = ff(x)
        return x, attn


class PositionalEncoding(nn.Module):
    """hand_net.py:61-77."""

    def __init__(self, d_model, dropout=0.0, max_len=5000):
        super().__init__()
        self.dropout = nn.Dropout(p=dropout)
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d_model, 2).float()
                             * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0))

    def forward(self, x):
        return self.dropout(x + self.pe[: x.size(0), :])


class EncoderTransformer(nn.Module):
    """hand_net.py:315-398 with mask_rate=0 (masking off)."""

    def __init__(self, mean_params, iteration=3, heads=8,
                 pos_embed=True):
        super().__init__()
        self.mean_params = mean_params.clone()
        self.conv1x1_channel_reduction = nn.Conv2d(512, 21, 1, 1, 0,
                                                   bias=False)
        self.transformer = Transformer(dim=784, depth=3, heads=heads,
                                       dim_head=64, mlp_dim=392)
        self.main_encoder = TorchResNet50Head()
        self.iteration = iteration
        self.pos_embed = pos_embed
        self.positionalEncoding = PositionalEncoding(784, max_len=21)
        self.mask_token = nn.Parameter(torch.randn(1, 1, 784))
        self.regressor = nn.Linear(1024 + 66, 66)

    def forward(self, main_input):
        main_feat, x1, x2, x3, x4 = self.main_encoder(main_input)
        feat_visual = self.conv1x1_channel_reduction(x2)
        feat = feat_visual.view(feat_visual.size(0), 21, -1)
        if self.pos_embed:
            feat = self.positionalEncoding(feat)
        feat_out = self.transformer(feat, None)
        feat_out = feat_out.view(feat_out.size(0), -1)
        pred_params = self.mean_params.repeat(x1.size(0), 1).clone()
        pred_params[:, 3:] = pred_params[:, 3:] + feat_out
        for _ in range(self.iteration):
            output = self.regressor(
                torch.cat((main_feat, pred_params), dim=1))
            pred_params = pred_params + output
        pred_3d = pred_params[:, 3:66].view(-1, 21, 3)
        root = pred_3d[:, 1].clone().unsqueeze(1)
        pred_3d = pred_3d - root
        pred_params = torch.cat(
            [pred_params[:, :3], pred_3d.reshape(-1, 63)], dim=1)
        return pred_params, feat_visual


class EncoderTransformerCoarse(nn.Module):
    """hand_net.py:216-311 with mask_rate=0."""

    def __init__(self, mean_params, heads=8, pos_embed=True):
        super().__init__()
        self.mean_params = mean_params.clone()
        self.conv1x1_channel_reduction = nn.Conv2d(512, 21, 1, 1, 0,
                                                   bias=False)
        self.transformer = TransformerAttn(dim=784, depth=3, heads=heads,
                                           dim_head=64, mlp_dim=392)
        self.main_encoder = TorchResNet50Head()
        self.pos_embed = pos_embed
        self.positionalEncoding = PositionalEncoding(784, max_len=21)
        self.mask_token = nn.Parameter(torch.randn(1, 1, 784))
        self.regressor = nn.Linear(1024 + 3, 3)

    def forward(self, main_input):
        main_feat, x1, x2, x3, x4 = self.main_encoder(main_input)
        feat_visual = self.conv1x1_channel_reduction(x2)
        feat = feat_visual.view(feat_visual.size(0), 21, -1)
        if self.pos_embed:
            feat = self.positionalEncoding(feat)
        feat_out, attn = self.transformer(feat, None)
        feat_out = feat_out.view(feat_out.size(0), -1)
        pred_params = self.mean_params.repeat(x1.size(0), 1).clone()
        pred_params[:, 3:] = pred_params[:, 3:] + feat_out
        cameras = self.regressor(
            torch.cat((main_feat, pred_params[:, :3]), dim=1))
        pred_3d = pred_params[:, 3:66].view(-1, 21, 3)
        root = pred_3d[:, 1].clone().unsqueeze(1)
        pred_3d = pred_3d - root
        pred_params = torch.cat([cameras, pred_3d.reshape(-1, 63)],
                                dim=1)
        return pred_params, feat_visual, attn


# ---------------------------------------------------------------------
# HRNet (reference models/hrnet.py:10-261) — module nesting matches the
# reference so state_dict keys line up with official/shipped weights.
# ---------------------------------------------------------------------

class HRBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


class HRBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(inplanes, planes, 3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + x)


class HRStageModule(nn.Module):
    """reference hrnet.py:79-144."""

    def __init__(self, stage, output_branches, c):
        super().__init__()
        self.stage = stage
        self.output_branches = output_branches
        self.branches = nn.ModuleList()
        for i in range(stage):
            w = c * (2 ** i)
            self.branches.append(nn.Sequential(
                *[HRBasicBlock(w, w) for _ in range(4)]))
        self.fuse_layers = nn.ModuleList()
        for i in range(output_branches):
            row = nn.ModuleList()
            for j in range(stage):
                if i == j:
                    row.append(nn.Sequential())
                elif i < j:
                    row.append(nn.Sequential(
                        nn.Conv2d(c * 2 ** j, c * 2 ** i, 1, bias=False),
                        nn.BatchNorm2d(c * 2 ** i),
                        nn.Upsample(scale_factor=2.0 ** (j - i),
                                    mode="nearest")))
                else:
                    ops = []
                    for _ in range(i - j - 1):
                        ops.append(nn.Sequential(
                            nn.Conv2d(c * 2 ** j, c * 2 ** j, 3, 2, 1,
                                      bias=False),
                            nn.BatchNorm2d(c * 2 ** j), nn.ReLU()))
                    ops.append(nn.Sequential(
                        nn.Conv2d(c * 2 ** j, c * 2 ** i, 3, 2, 1,
                                  bias=False),
                        nn.BatchNorm2d(c * 2 ** i)))
                    row.append(nn.Sequential(*ops))
            self.fuse_layers.append(row)
        self.relu = nn.ReLU()

    def forward(self, x):
        x = [branch(b) for branch, b in zip(self.branches, x)]
        fused = []
        for i in range(len(self.fuse_layers)):
            for j in range(len(self.branches)):
                if j == 0:
                    fused.append(self.fuse_layers[i][0](x[0]))
                else:
                    fused[i] = fused[i] + self.fuse_layers[i][j](x[j])
        return [self.relu(f) for f in fused]


class TorchHRNet(nn.Module):
    """reference hrnet.py:147-261."""

    def __init__(self, c=48, nof_joints=17):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        downsample = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False),
                                   nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(
            HRBottleneck(64, 64, downsample=downsample),
            HRBottleneck(256, 64), HRBottleneck(256, 64),
            HRBottleneck(256, 64))
        self.transition1 = nn.ModuleList([
            nn.Sequential(nn.Conv2d(256, c, 3, 1, 1, bias=False),
                          nn.BatchNorm2d(c), nn.ReLU()),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(256, c * 2, 3, 2, 1, bias=False),
                nn.BatchNorm2d(c * 2), nn.ReLU()))])
        self.stage2 = nn.Sequential(HRStageModule(2, 2, c))
        self.transition2 = nn.ModuleList([
            nn.Sequential(), nn.Sequential(),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(c * 2, c * 4, 3, 2, 1, bias=False),
                nn.BatchNorm2d(c * 4), nn.ReLU()))])
        self.stage3 = nn.Sequential(
            *[HRStageModule(3, 3, c) for _ in range(4)])
        self.transition3 = nn.ModuleList([
            nn.Sequential(), nn.Sequential(), nn.Sequential(),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(c * 4, c * 8, 3, 2, 1, bias=False),
                nn.BatchNorm2d(c * 8), nn.ReLU()))])
        self.stage4 = nn.Sequential(
            HRStageModule(4, 4, c), HRStageModule(4, 4, c),
            HRStageModule(4, 1, c))
        self.final_layer = nn.Conv2d(c, nof_joints, 1)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        x = [trans(x) for trans in self.transition1]
        x = self.stage2(x)
        x = [self.transition2[0](x[0]), self.transition2[1](x[1]),
             self.transition2[2](x[-1])]
        x = self.stage3(x)
        x = [self.transition3[0](x[0]), self.transition3[1](x[1]),
             self.transition3[2](x[2]), self.transition3[3](x[-1])]
        x = self.stage4(x)
        return self.final_layer(x[0])


# ---------------------------------------------------------------------
# Truncated Inception-v3 (reference models/inception.py:62-139: stem
# through Mixed_6e, aux/D/E heads absent from the truncated forward).
# Torchvision-style names so real checkpoints map directly.
# ---------------------------------------------------------------------

class BasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchInceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                          padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                          padding=1)
        self.branch_pool = BasicConv2d(in_ch, pool_features,
                                       kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
            self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b5, bd, bp], 1)


class TorchInceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                          padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                          stride=2)

    def forward(self, x):
        import torch.nn.functional as F
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
            self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, 2)
        return torch.cat([b3, bd, bp], 1)


class TorchInceptionC(nn.Module):
    def __init__(self, in_ch, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(
                self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b7, bd, bp], 1)


class TorchInception3Trunc(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3,
                                         padding=1)
        self.maxpool1 = nn.MaxPool2d(3, 2)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.maxpool2 = nn.MaxPool2d(3, 2)
        self.Mixed_5b = TorchInceptionA(192, 32)
        self.Mixed_5c = TorchInceptionA(256, 64)
        self.Mixed_5d = TorchInceptionA(288, 64)
        self.Mixed_6a = TorchInceptionB(288)
        self.Mixed_6b = TorchInceptionC(768, 128)
        self.Mixed_6c = TorchInceptionC(768, 160)
        self.Mixed_6d = TorchInceptionC(768, 160)
        self.Mixed_6e = TorchInceptionC(768, 192)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = self.maxpool1(x)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = self.maxpool2(x)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        return self.Mixed_6e(x)


class _TorchTokenHead(nn.Module):
    """The shared 128-token head of the HRNet/Inception variants
    (reference hand_net.py:87-146 / :150-213): conv reduction -> 128
    tokens x 196 -> PE -> pyramid transformer -> token mean-pool ->
    iterative Linear refinement from the 61-dim mean params.

    The shipped reference declares the regressor as
    ``Linear(196+61, 61)`` but feeds it the pyramid's 3-dim mean-pooled
    output — a shape mismatch that crashes as shipped (hand_net.py:102,
    141-144).  This oracle is the declared architecture with the input
    width the forward actually produces (3+61), i.e. the working version
    both sides implement; every other module/key matches the reference
    nesting exactly."""

    def __init__(self, mean_params, conv, iteration=3, heads=8,
                 depth=3, pos_embed=True):
        super().__init__()
        self.mean_params = mean_params.clone()   # [1, 61]
        self.conv1x1_channel_reduction = conv
        self.transformer = Transformer(dim=196, depth=depth, heads=heads,
                                       dim_head=64, mlp_dim=392)
        self.iteration = iteration
        self.regressor = nn.Sequential(nn.Linear(3 + 61, 61))
        self.pos_embed = pos_embed
        self.positionalEncoding = PositionalEncoding(196, max_len=128)
        self.mask_token = nn.Parameter(torch.randn(1, 1, 196))

    def run(self, feat_map):
        feat = self.conv1x1_channel_reduction(feat_map)
        feat = feat.view(feat.size(0), 128, -1)
        if self.pos_embed:
            feat = self.positionalEncoding(feat)
        feat = self.transformer(feat, None).mean(dim=1)
        pred = self.mean_params.repeat(feat.size(0), 1).clone()
        for _ in range(self.iteration):
            pred = pred + self.regressor(
                torch.cat([feat, pred], dim=-1))
        return pred


class EncoderTransformerHRNet(_TorchTokenHead):
    """reference hand_net.py:150-213: HRNet(c=24, 128 joints) ->
    [bs,128,56,56] viewed as [bs,512,28,28] -> conv(512->128,k3,s2,p1)
    -> token head."""

    def __init__(self, mean_params, iteration=3, heads=8, depth=3,
                 pos_embed=True):
        super().__init__(
            mean_params,
            nn.Conv2d(512, 128, 3, 2, 1, bias=False),
            iteration=iteration, heads=heads, depth=depth,
            pos_embed=pos_embed)
        self.main_encoder = TorchHRNet(c=24, nof_joints=128)

    def forward(self, x):
        f = self.main_encoder(x)                       # [bs,128,56,56]
        # reference uses .view (hand_net.py:187); reshape is identical on
        # the logical layout and robust to torch memory-format choices
        return self.run(f.reshape(f.size(0), 512, 28, 28))


class EncoderTransformerInception(_TorchTokenHead):
    """reference hand_net.py:87-146: truncated Inception3 ->
    [bs,768,12,12] viewed as [bs,192,24,24] -> conv(192->128,k3,s2,p3)
    -> token head."""

    def __init__(self, mean_params, iteration=3, heads=8, depth=3,
                 pos_embed=True):
        super().__init__(
            mean_params,
            nn.Conv2d(192, 128, 3, 2, 3, bias=False),
            iteration=iteration, heads=heads, depth=depth,
            pos_embed=pos_embed)
        self.main_encoder = TorchInception3Trunc()

    def forward(self, x):
        f = self.main_encoder(x)                       # [bs,768,12,12]
        # reference uses .view (hand_net.py:123); see HRNet note above
        return self.run(f.reshape(f.size(0), 192, 24, 24))


class TorchViT(nn.Module):
    """reference vision_transformer.py:103-153: einops patchify ->
    linear patch embed -> cls + learned pos-embed -> pyramid transformer
    -> mean-pool -> HMR iterative head.  The reference declares the head
    as ``Linear(dim+num_classes, num_classes)`` but the pyramid's
    mean-pooled output is 3-dim (same shape bug family as the
    HRNet/Inception heads); this oracle uses the actually-produced
    input width (3+num_classes)."""

    def __init__(self, mean_params, image_size=224, patch_size=16,
                 num_classes=66, dim=256, depth=3, heads=8, dim_head=64,
                 iteration=1):
        super().__init__()
        self.patch_size = patch_size
        n = (image_size // patch_size) ** 2
        patch_dim = 3 * patch_size ** 2
        self.pos_embedding = nn.Parameter(torch.randn(1, n + 1, dim))
        self.patch_to_embedding = nn.Linear(patch_dim, dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim))
        self.transformer = Transformer(dim, depth, heads, dim_head,
                                       mlp_dim=dim * 2)
        self.head = nn.Sequential(nn.Linear(3 + num_classes,
                                            num_classes))
        self.iteration = iteration
        self.mean_params = mean_params.clone()   # [1, num_classes]

    def forward(self, img):
        p = self.patch_size
        b, c, H, W = img.shape
        x = img.reshape(b, c, H // p, p, W // p, p)
        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
        x = x.permute(0, 2, 4, 3, 5, 1).reshape(
            b, (H // p) * (W // p), p * p * c)
        x = self.patch_to_embedding(x)
        n = x.size(1)
        x = torch.cat(
            [self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embedding[:, : n + 1]
        x = self.transformer(x, None)
        feat = x.mean(dim=1)
        pred = self.mean_params.repeat(b, 1).clone()
        for _ in range(self.iteration):
            pred = pred + self.head(torch.cat([feat, pred], dim=1))
        return pred


class TorchPerformerBlock(nn.Module):
    """reference vision_performer.py:12-68 verbatim semantics: one
    shared kqv Linear(emb_s -> 3*emb_s) and one frozen Gaussian ``w``
    applied per head chunk."""

    def __init__(self, emb_s, head, kernel_ratio=0.5, dp_ratio=0.0):
        super().__init__()
        emb = emb_s * head
        self.kqv = nn.Linear(emb_s, 3 * emb_s)
        self.dp = nn.Dropout(dp_ratio)
        self.proj = nn.Linear(emb, emb)
        self.emb_s = emb_s
        self.ln1 = nn.LayerNorm(emb)
        self.ln2 = nn.LayerNorm(emb)
        self.mlp = nn.Sequential(nn.Linear(emb, 4 * emb), nn.GELU(),
                                 nn.Linear(4 * emb, emb),
                                 nn.Dropout(dp_ratio))
        self.m = int(emb_s * kernel_ratio)
        self.w = nn.Parameter(torch.randn(self.m, emb_s),
                              requires_grad=False)

    def prm_exp(self, x):
        xd = (x * x).sum(dim=-1, keepdim=True).repeat(1, 1, self.m) / 2
        wtx = torch.einsum("bti,mi->btm", x, self.w)
        return torch.exp(wtx - xd) / math.sqrt(self.m)

    def forward_single_attn(self, x):
        k, q, v = torch.split(self.kqv(x), self.emb_s, dim=-1)
        kp, qp = self.prm_exp(k), self.prm_exp(q)
        D = torch.einsum("bti,bi->bt", qp,
                         kp.sum(dim=1)).unsqueeze(dim=2)
        kptv = torch.einsum("bin,bim->bnm", v, kp)
        return torch.einsum("bti,bni->btn", qp,
                            kptv) / D.repeat(1, 1, self.emb_s)

    def forward(self, x):
        y = self.ln1(x)
        splits = torch.split(y, self.emb_s, dim=-1)
        mha = torch.cat([self.forward_single_attn(t) for t in splits],
                        dim=-1)
        x = x + self.dp(self.proj(mha))
        return x + self.mlp(self.ln2(x))


class TorchViP(nn.Module):
    """reference vision_performer.py:70-116 (Unfold patchify, zero-init
    pos-embed added BEFORE the cls concat, performer blocks, mean-pool,
    HMR iterative head Linear(emb+out_dim -> out_dim))."""

    def __init__(self, mean_params, image_pix=64, patch_pix=4,
                 out_dim=66, emb_s=32, heads=4, depth=3,
                 kernel_ratio=0.5, iteration=1):
        super().__init__()
        tokens_cnt = (image_pix // patch_pix) ** 2
        patch_size = 3 * patch_pix * patch_pix
        emb = emb_s * heads
        self.uf = nn.Unfold(kernel_size=[patch_pix, patch_pix],
                            stride=[patch_pix, patch_pix])
        self.pos_emb = nn.Parameter(torch.zeros(1, tokens_cnt, emb))
        self.head = nn.Linear(emb + out_dim, out_dim)
        self.patch_emb = nn.Linear(patch_size, emb)
        self.cls_token = nn.Parameter(torch.rand(1, 1, emb))
        self.mains = nn.Sequential(
            *[TorchPerformerBlock(emb_s, heads, kernel_ratio, 0.0)
              for _ in range(depth)])
        self.iteration = iteration
        self.mean_params = mean_params.clone()   # [1, out_dim]

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_emb(self.uf(x).transpose(1, 2)) + self.pos_emb
        x = torch.cat([self.cls_token.repeat(b, 1, 1), x], dim=1)
        x = self.mains(x)
        feat = x.mean(dim=1)
        pred = self.mean_params.repeat(b, 1).clone()
        for _ in range(self.iteration):
            pred = pred + self.head(torch.cat([feat, pred], dim=1))
        return pred


class TorchH3DWEncoder(nn.Module):
    """reference hand_net.py:28-58 (frankmocap baseline)."""

    def __init__(self, mean_params):
        super().__init__()
        self.mean_params = mean_params.clone()
        relu = nn.ReLU()
        fc2 = nn.Linear(1024, 1024)
        self.feat_encoder = nn.Sequential(relu, fc2, relu)
        self.regressor = nn.Sequential(nn.Linear(1024 + 61, 61))
        self.main_encoder = TorchResNet50Head()

    def forward(self, x):
        main_feat, *_ = self.main_encoder(x)
        feat = self.feat_encoder(main_feat)
        pred = self.mean_params.repeat(x.size(0), 1).clone()
        for _ in range(3):
            pred = pred + self.regressor(torch.cat([feat, pred], 1))
        return feat, pred
