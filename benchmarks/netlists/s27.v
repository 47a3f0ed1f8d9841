// ISCAS'89 s27 sequential benchmark, HELM processed-netlist format:
// 4 inputs, 1 output, 3 DFFs, 10 combinational gates.
module s27(G0, G1, G2, G3, G17);
  input G0, G1, G2, G3;
  output G17;
  wire G5, G6, G7, G8, G9, G10, G11, G12, G13, G14, G15, G16;

  dff d1(G10, G5);
  dff d2(G11, G6);
  dff d3(G13, G7);
  not g0(G0, G14);
  not g1(G11, G17);
  and g2(G14, G6, G8);
  or g3(G12, G8, G15);
  or g4(G3, G8, G16);
  nand g5(G16, G15, G9);
  nor g6(G14, G11, G10);
  nor g7(G5, G9, G11);
  nor g8(G1, G7, G12);
  nor g9(G2, G12, G13);
endmodule
