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
