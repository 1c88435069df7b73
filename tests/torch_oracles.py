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
