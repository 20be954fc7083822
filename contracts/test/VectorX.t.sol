// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

import "forge-std/Test.sol";
import {VectorX} from "../src/VectorX.sol";
import {IVectorX} from "../src/interfaces/IVectorX.sol";
import {ERC1967Proxy} from "../src/upgrades/ERC1967Proxy.sol";

/// @dev Scripted gateway double: requestCall records the request, and
///      verifiedCall returns a pre-programmed output for an expected
///      (functionId, input) pair — the verification boundary the real
///      SuccinctGateway enforces on-chain.
contract MockGateway {
    bytes32 public expectedFunctionId;
    bytes32 public expectedInputHash;
    bytes public output;
    uint256 public requests;

    function program(
        bytes32 functionId,
        bytes memory input,
        bytes memory _output
    ) external {
        expectedFunctionId = functionId;
        expectedInputHash = keccak256(input);
        output = _output;
    }

    function requestCall(
        bytes32,
        bytes memory,
        address,
        bytes memory,
        uint32
    ) external payable {
        requests += 1;
    }

    function verifiedCall(bytes32 functionId, bytes memory input)
        external
        view
        returns (bytes memory)
    {
        require(functionId == expectedFunctionId, "unexpected functionId");
        require(keccak256(input) == expectedInputHash, "unexpected input");
        return output;
    }

    function isCallback() external pure returns (bool) {
        return false;
    }
}

/// @notice Foundry tests: the reference's calldata smoke test
///         (reference contracts/test/VectorX.t.sol:14-27) plus behavioral
///         coverage of the commit/rotate state machine against a scripted
///         gateway.  Mirrors the hermetic Python model tests
///         (tests/test_services.py over vectorx_tpu/services/contract.py);
///         run with `forge test` (see ../README.md — no Solidity toolchain
///         ships in the build environment, CI runs this in the pinned
///         foundry container, .github/workflows/contracts.yml).
contract VectorXTest is Test {
    VectorX public lightClient;
    MockGateway public gateway;

    uint32 constant GENESIS_HEIGHT = 645570;
    bytes32 constant GENESIS_HEADER = bytes32(uint256(0xdead));
    uint64 constant GENESIS_SET_ID = 616;
    bytes32 constant GENESIS_SET_HASH = bytes32(uint256(0xbeef));
    bytes32 constant HR_FID = bytes32(uint256(1));
    bytes32 constant ROT_FID = bytes32(uint256(2));

    function setUp() public {
        gateway = new MockGateway();
        VectorX impl = new VectorX();
        lightClient = VectorX(address(new ERC1967Proxy(address(impl), "")));
        lightClient.initialize(
            VectorX.InitParameters({
                guardian: address(this),
                gateway: address(gateway),
                height: GENESIS_HEIGHT,
                header: GENESIS_HEADER,
                authoritySetId: GENESIS_SET_ID,
                authoritySetHash: GENESIS_SET_HASH,
                headerRangeFunctionId: HR_FID,
                rotateFunctionId: ROT_FID,
                headerRangeCommitmentTreeSize: 256
            })
        );
    }

    /// Reference parity: commitHeaderRange callback calldata encoding.
    function testEncoding() public view {
        uint32 targetBlock = 645610;
        bytes memory encodedBytes = abi.encodeWithSelector(
            lightClient.commitHeaderRange.selector,
            GENESIS_SET_ID,
            targetBlock
        );
        console.logBytes(encodedBytes);
        assertEq(encodedBytes.length, 4 + 32 + 32);
    }

    function _headerRangeInput(uint32 target) internal view returns (bytes memory) {
        return abi.encodePacked(
            lightClient.latestBlock(),
            GENESIS_HEADER,
            GENESIS_SET_ID,
            GENESIS_SET_HASH,
            target
        );
    }

    function testCommitHeaderRange() public {
        uint32 target = GENESIS_HEIGHT + 180;
        bytes32 targetHash = bytes32(uint256(0x1111));
        bytes32 stateRoot = bytes32(uint256(0x2222));
        bytes32 dataRoot = bytes32(uint256(0x3333));
        gateway.program(
            HR_FID,
            _headerRangeInput(target),
            abi.encode(targetHash, stateRoot, dataRoot)
        );

        lightClient.commitHeaderRange(GENESIS_SET_ID, target);

        assertEq(lightClient.latestBlock(), target);
        assertEq(lightClient.blockHeightToHeaderHash(target), targetHash);
        bytes32 key = keccak256(abi.encode(GENESIS_HEIGHT, target));
        assertEq(lightClient.dataRootCommitments(key), dataRoot);
        assertEq(lightClient.stateRootCommitments(key), stateRoot);
        assertEq(lightClient.rangeStartBlocks(key), GENESIS_HEIGHT);
    }

    function testCommitHeaderRangeRevertsWhenFrozen() public {
        lightClient.updateFreeze(true);
        vm.expectRevert(IVectorX.ContractFrozen.selector);
        lightClient.commitHeaderRange(GENESIS_SET_ID, GENESIS_HEIGHT + 1);
    }

    function testCommitHeaderRangeUnknownAuthoritySet() public {
        vm.expectRevert(IVectorX.AuthoritySetNotFound.selector);
        lightClient.commitHeaderRange(GENESIS_SET_ID + 5, GENESIS_HEIGHT + 1);
    }

    function testRequestHeaderRangeEmitsAndForwards() public {
        lightClient.requestHeaderRange(GENESIS_SET_ID, GENESIS_HEIGHT + 10);
        assertEq(gateway.requests(), 1);
    }

    function testRotate() public {
        bytes32 nextHash = bytes32(uint256(0x4444));
        gateway.program(
            ROT_FID,
            abi.encodePacked(GENESIS_SET_ID, GENESIS_SET_HASH),
            abi.encode(nextHash)
        );

        lightClient.rotate(GENESIS_SET_ID);
        assertEq(lightClient.authoritySetIdToHash(GENESIS_SET_ID + 1), nextHash);

        // second rotate for the same set must refuse to overwrite
        vm.expectRevert(IVectorX.NextAuthoritySetExists.selector);
        lightClient.rotate(GENESIS_SET_ID);
    }

    function testGuardianGate() public {
        vm.prank(address(0xabcd));
        vm.expectRevert();
        lightClient.updateFreeze(true);
    }
}
